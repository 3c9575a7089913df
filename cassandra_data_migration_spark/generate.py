"""S11: deterministic synthetic data generation (SURVEY.md §2.1).

The reference generator (lab/scripts/generate_data.py:29-158) builds
users/products/orders/user_activity with unseeded ``random``/``uuid4``
through a driver-side loop.  Re-expressed Spark-first:

- ``spark.range(n)`` is the source → generation is distributed and
  linear in cluster size (a 100 TB synthetic corpus is just a bigger
  ``n`` with more partitions; no driver loop, no collect).
- Every "random" value is a pure function of (seed, row id) via
  ``functions.hashing.md5_draw`` — partition-count-independent,
  reproducible (SURVEY.md §7.4.3) unlike ``rand()`` whose draw
  depends on the physical partitioning, and portable: the DuckDB
  oracle recomputes identical draws, so generated tables are
  value-checked, not just row-counted.
- UUIDs are md5-derived canonical 36-char strings, so FK sampling
  (orders → users, lab/scripts/generate_data.py:113) can recompute a
  referenced key arithmetically instead of collecting key arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_data_migration_spark.functions.hashing import md5_draw
from cassandra_data_migration_spark.schema import ORDERS, PRODUCTS, USER_ACTIVITY, USERS

FIRST_NAMES = ["john", "jane", "alex", "maria", "wei", "ana", "omar", "lena"]
LAST_NAMES = ["smith", "garcia", "chen", "mueller", "silva", "khan", "ito", "novak"]
STATUSES = ["active", "inactive", "suspended"]
CATEGORIES = ["electronics", "books", "clothing", "home", "sports"]
ORDER_STATUSES = ["pending", "shipped", "delivered", "cancelled"]
ACTIVITY_TYPES = ["login", "logout", "view_product", "add_to_cart", "purchase"]
EPOCH_2024_S = 1704067200  # 2024-01-01T00:00:00Z


def _h(seed: int, *cols: Column | str) -> Column:
    """Deterministic non-negative draw from (seed, cols) — md5-derived
    so the DuckDB oracle recomputes it (functions/hashing.md5_draw)."""
    return md5_draw(seed, *cols)


def _pick(options: list[str], seed: int, id_col: str = "id") -> Column:
    """Deterministic choice from a literal list (random.choice analogue,
    lab/scripts/generate_data.py:42-53)."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (_h(seed, id_col) % len(options) + 1).cast("int"))


def _uuid_from(seed: int, *cols: Column | str) -> Column:
    """Canonical 36-char uuid string derived from md5(seed, cols)."""
    hx = F.md5(F.concat_ws(":", F.lit(str(seed)), *[
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in cols
    ]))
    return F.concat_ws(
        "-",
        F.substring(hx, 1, 8),
        F.substring(hx, 9, 4),
        F.substring(hx, 13, 4),
        F.substring(hx, 17, 4),
        F.substring(hx, 21, 12),
    )


def _ts(seed: int, id_col: str, span_days: int) -> Column:
    """Deterministic timestamp in [2024-01-01, +span_days)."""
    offset_s = _h(seed, id_col) % (span_days * 86400)
    return F.timestamp_seconds(F.lit(EPOCH_2024_S) + offset_s)


def generate_users(spark: SparkSession, count: int = 1000, seed: int = 42) -> DataFrame:
    """lab/scripts/generate_data.py:29-66 re-expressed declaratively."""
    df = spark.range(count)
    first = _pick(FIRST_NAMES, seed + 1)
    last = _pick(LAST_NAMES, seed + 2)
    username = F.concat(first, F.lit("."), last, F.col("id").cast("string"))
    return df.select(
        _uuid_from(seed, "id").alias("user_id"),
        username.alias("username"),
        F.concat(username, F.lit("@example.com")).alias("email"),
        F.initcap(first).alias("first_name"),
        F.initcap(last).alias("last_name"),
        _ts(seed + 3, "id", 365).alias("created_at"),
        _pick(STATUSES, seed + 4).alias("status"),
        F.format_string("%d Main St, City %d", (_h(seed + 5, "id") % 9999).cast("int"),
                        (_h(seed + 6, "id") % 100).cast("int")).alias("address"),
        F.format_string("+1-555-%07d", (_h(seed + 7, "id") % 10_000_000).cast("int")).alias("phone"),
        F.create_map(
            F.lit("theme"), _pick(["dark", "light"], seed + 8),
            F.lit("notifications"), _pick(["on", "off"], seed + 9),
            F.lit("language"), _pick(["en", "es", "fr"], seed + 10),
        ).alias("preferences"),
    )


def generate_products(spark: SparkSession, count: int = 500, seed: int = 42) -> DataFrame:
    """lab/scripts/generate_data.py:68-99."""
    df = spark.range(count)
    price_cents = _h(seed + 21, "id") % 99001 + 1000  # 10.00 .. 1000.00
    return df.select(
        _uuid_from(seed + 20, "id").alias("product_id"),
        F.format_string("Product %d", F.col("id").cast("int")).alias("name"),
        F.format_string("Description for product %d", F.col("id").cast("int")).alias("description"),
        (price_cents / 100.0).cast("decimal(18,2)").alias("price"),
        _pick(CATEGORIES, seed + 22).alias("category"),
        (_h(seed + 23, "id") % 1000).cast("int").alias("stock_quantity"),
        _ts(seed + 24, "id", 365).alias("created_at"),
    )


def generate_orders(
    spark: SparkSession,
    count: int = 2000,
    n_users: int = 1000,
    n_products: int = 500,
    seed: int = 42,
) -> DataFrame:
    """lab/scripts/generate_data.py:101-129.  FK references (J4) are
    recomputed arithmetically: pick a user ordinal deterministically,
    re-derive its uuid with the users' generator formula — no collect,
    no join, still referentially intact."""
    df = spark.range(count)
    user_ord = (_h(seed + 31, "id") % n_users).cast("long")
    n_items = (_h(seed + 32, "id") % 5 + 1).cast("int")
    product_ord = lambda i: (_h(seed + 33 + i, "id") % n_products).cast("long")  # noqa: E731
    amount_cents = _h(seed + 34, "id") % 490001 + 10000  # 100.00 .. 5000.00
    return df.select(
        _uuid_from(seed + 30, "id").alias("order_id"),
        _uuid_from(seed, user_ord).alias("user_id"),
        _ts(seed + 35, "id", 180).alias("order_date"),
        (amount_cents / 100.0).cast("decimal(18,2)").alias("total_amount"),
        _pick(ORDER_STATUSES, seed + 36).alias("status"),
        F.slice(
            F.array(*[_uuid_from(seed + 20, product_ord(i)) for i in range(5)]),
            1,
            n_items,
        ).alias("items"),
        F.format_string("%d Shipping Ln", (_h(seed + 37, "id") % 9999).cast("int")).alias(
            "shipping_address"
        ),
    )


def generate_user_activity(
    spark: SparkSession, count: int = 5000, n_users: int = 1000, seed: int = 42
) -> DataFrame:
    """lab/scripts/generate_data.py:131-158 — the time-series table:
    composite partition key (user_id, activity_date), clustering
    activity_time DESC."""
    df = spark.range(count)
    user_ord = (_h(seed + 41, "id") % n_users).cast("long")
    t = _ts(seed + 42, "id", 30)
    return df.select(
        _uuid_from(seed, user_ord).alias("user_id"),
        F.to_date(t).alias("activity_date"),
        t.alias("activity_time"),
        _pick(ACTIVITY_TYPES, seed + 43).alias("activity_type"),
        F.format_string("{\"session\": %d}", (_h(seed + 44, "id") % 100000).cast("int")).alias(
            "details"
        ),
    )


def generate_training_keyspace(
    spark: SparkSession,
    scale: int = 1,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """The full lab dataset (users 1000, products 500, orders 2000,
    user_activity 5000 at scale=1 — lab/scripts/generate_data.py:187-190),
    linearly scalable."""
    n_users, n_products = 1000 * scale, 500 * scale
    dfs = {
        "users": generate_users(spark, n_users, seed),
        "products": generate_products(spark, n_products, seed),
        "orders": generate_orders(spark, 2000 * scale, n_users, n_products, seed),
        "user_activity": generate_user_activity(spark, 5000 * scale, n_users, seed),
    }
    expected = {"users": USERS, "products": PRODUCTS, "orders": ORDERS,
                "user_activity": USER_ACTIVITY}
    for name, df in dfs.items():
        got = [(f.name) for f in df.schema.fields]
        want = [f.name for f in expected[name].fields]
        assert got == want, f"{name}: {got} != {want}"
    return dfs
