"""Set operations (SURVEY.md §2.7 U1-U3)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """U1/U3: multi-DataFrame union by name."""
    return reduce(lambda a, b: a.unionByName(b), dfs)


def per_table_summary(tables: dict[str, DataFrame]) -> DataFrame:
    """U1: the validation report's cross-table roll-up
    (lab/scripts/validate_migration.py:21-74) — one count per table,
    unioned into a single result."""
    parts = [
        df.agg(F.count(F.lit(1)).alias("row_count")).select(
            F.lit(name).alias("table_name"), "row_count"
        )
        for name, df in tables.items()
    ]
    return union_all(parts)


def value_set_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """U2 primitive: bag difference (EXCEPT ALL) of two same-schema
    sides — the normalized schema diff uses this over
    (column, type) rows."""
    return a.exceptAll(b)


def conform_schema(
    df: DataFrame,
    target: DataFrame,
    fill_missing: bool = True,
) -> DataFrame:
    """Conform ``df`` to ``target``'s schema: reorder columns, cast
    matching columns to the target type, add NULL-filled columns the
    source lacks, drop extras.  The reference REQUIRES origin and
    target schemas to match exactly and treats drift as a failure
    (reference docs/05-zdm-approach.md:18, schema diff in
    lab/exercises/06-validation-monitoring.md:187-233); this stage is
    the remediation half — run ``plans/validate.schema_diff`` to see
    the drift, ``conform_schema`` to resolve it before a Migrate.

    Pure projection: zero shuffles, casts fold into the scan."""
    from pyspark.sql import functions as F

    src = dict(df.dtypes)
    cols = []
    for f in target.schema.fields:
        if f.name in src:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        elif fill_missing:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(
                f"conform_schema: source lacks column {f.name!r} and "
                "fill_missing=False"
            )
    return df.select(*cols)


def multiset_compare(a: DataFrame, b: DataFrame) -> DataFrame:
    """Full bag-semantics comparison of two same-schema sides in one
    report row: |A EXCEPT ALL B|, |A INTERSECT ALL B|, |B EXCEPT ALL
    A|.  Duplicates count with multiplicity — the distinction that
    row-hash set diffs miss when a migration DUPLICATES rows instead
    of dropping them (list-append re-run duplication is a documented
    reference hazard, docs/04-cdm-approach.md:834).

    Plan (round 12): ONE lazy pass instead of three eager set-ops —
    tag each side, union, groupBy the full row with per-side counts
    (map-side partial aggregation collapses duplicates before the
    exchange), then reduce the three bag counts from the per-distinct-
    row pair (ca, cb): ``only_a = Σ max(ca−cb, 0)``, ``in_both =
    Σ min(ca, cb)``, ``only_b = Σ max(cb−ca, 0)``.  GROUP BY groups
    NULLs (and NaNs) together exactly as EXCEPT ALL / INTERSECT ALL
    row-equality does, so the counts are identical to the set-op
    formulation while the canonicalized rows cross the network once
    instead of six half-passes, and one action computes all three
    (guide §2.3/§2.4).  At scale, project to (pk, row_hash) first so
    the exchange carries 16 bytes/row."""
    cols = a.columns
    u = a.select(
        *cols, F.lit(1).alias("_sa"), F.lit(0).alias("_sb")
    ).unionByName(
        b.select(*cols, F.lit(0).alias("_sa"), F.lit(1).alias("_sb"))
    )
    per_row = u.groupBy(*cols).agg(
        F.sum("_sa").alias("_ca"), F.sum("_sb").alias("_cb")
    )
    zero = F.lit(0).cast("long")
    return per_row.agg(
        F.coalesce(
            F.sum(F.greatest(F.col("_ca") - F.col("_cb"), zero)), zero
        ).cast("long").alias("only_origin"),
        F.coalesce(F.sum(F.least("_ca", "_cb")), zero)
        .cast("long")
        .alias("in_both"),
        F.coalesce(
            F.sum(F.greatest(F.col("_cb") - F.col("_ca"), zero)), zero
        ).cast("long").alias("only_target"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus snapshot diff for training-data versioning: classify
    every id across two corpus snapshots as added / removed /
    changed / unchanged by comparing content fingerprints — the
    what-moved report a dataset release pipeline publishes between
    versions (and the input to incremental re-tokenization: only
    added ∪ changed re-process).

    One full outer join on the id key carrying (id, 16-byte md5)
    pairs — text never shuffles; at 100 TB both sides are one scan
    plus one id-keyed exchange each, the same shape as the
    missing/mismatch validators (operators/joins.py), applied to the
    corpus instead of the migration target."""
    o = old.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_fp_old")
    )
    n = new.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_fp_new")
    )
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        o.join(n, id_col, "full_outer")
        .select(F.col(id_col), status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
