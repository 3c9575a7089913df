"""Scalar function surface (SURVEY.md §2.8 F1-F13).

Each family the reference exercises, as thin named wrappers over
``pyspark.sql.functions`` — all JVM-side, codegen'd, UDF-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gen_uuid() -> Column:
    """F1: uuid() (lab/scripts/generate_data.py:41).  Random; for
    reproducible ids use generate._uuid_from."""
    return F.expr("uuid()")


def now_ts() -> Column:
    """F2: toTimestamp(now())."""
    return F.current_timestamp()


def days_ago(n: int) -> Column:
    """F3: now() - timedelta(days=n) (generate_data.py:46)."""
    return F.current_timestamp() - F.expr(f"INTERVAL {n} DAYS")


def derive_date(ts_col: str) -> Column:
    """F3: date from timestamp (generate_data.py:143-146)."""
    return F.to_date(F.col(ts_col))


def username_email(first: Column, last: Column, i: Column) -> tuple[Column, Column]:
    """F4: f"{first.lower()}.{last.lower()}{i}" + email
    (generate_data.py:44-45)."""
    username = F.concat(F.lower(first), F.lit("."), F.lower(last), i.cast("string"))
    return username, F.concat(username, F.lit("@example.com"))


def like_prefix(col: str, prefix: str) -> Column:
    """F5: LIKE 'prefix%' (lab/exercises/05-zdm-migration.md:665-666)."""
    return F.col(col).like(prefix + "%")


def money_round(col: Column | str, scale: int = 2) -> Column:
    """F7: round + Decimal(18,2) cast (generate_data.py:84,117)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale).cast("decimal(18,2)")


def json_get(col: str, key: str) -> Column:
    """F11: CDM extractJson (docs/04-cdm-approach.md:465)."""
    return F.get_json_object(F.col(col), f"$.{key}")


def explode_map(df: DataFrame, map_col: str) -> DataFrame:
    """F11: CDM explodeMap — one row per map entry with key/value
    columns (the single UDTF-shaped feature; built-in explode)."""
    return df.select(
        *[c for c in df.columns if c != map_col],
        F.explode(F.col(map_col)).alias(f"{map_col}_key", f"{map_col}_value"),
    )


def explode_tokens(df: DataFrame, text_col: str, out: str = "token") -> DataFrame:
    """explode over split — the text-side UDTF shape (used by dedup &
    text analysis too)."""
    return df.select(
        *[c for c in df.columns if c != text_col],
        F.explode(F.split(F.col(text_col), " ")).alias(out),
    )


def constant_column(df: DataFrame, name: str, value) -> Column:
    """F11: constant-column feature (docs/04-cdm-approach.md:465)."""
    return F.lit(value).alias(name)
