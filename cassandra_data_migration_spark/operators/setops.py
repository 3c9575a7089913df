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

    Plan: each set op is one hash shuffle of the canonicalized rows;
    the three counts reduce map-side.  At scale, project to
    (pk, row_hash) first so the exchanges carry 16 bytes/row."""
    only_a = a.exceptAll(b).count()
    in_both = a.intersectAll(b).count()
    only_b = b.exceptAll(a).count()
    spark = a.sparkSession
    return spark.createDataFrame(
        [(only_a, in_both, only_b)],
        "only_origin long, in_both long, only_target long",
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
