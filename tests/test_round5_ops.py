"""Round-5 operators: exact substring-duplication spans (suffix-array
dedup re-expressed), span corruption, preference pairs."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_dup_spans_cross_doc_run(spark):
    """An 8-token run shared by two docs is one merged span of 8
    duplicated tokens in each; an all-unique doc reports zero."""
    from cassandra_data_migration_spark.operators.dedup import substring_dup_spans

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    rows = [
        (1, f"a1 a2 a3 {shared} a4 a5"),
        (2, f"b1 b2 {shared} b3 b4 b5"),
        (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
    ]
    out = {
        r["doc_id"]: r
        for r in substring_dup_spans(_docs(spark, rows), k=5).collect()
    }
    assert out[1]["n_dup_spans"] == 1 and out[1]["dup_tokens"] == 8
    assert out[2]["n_dup_spans"] == 1 and out[2]["dup_tokens"] == 8
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_tokens"] == 0
    assert out[3]["dup_frac"] == 0.0
    assert out[1]["n_tokens"] == 13
    assert abs(out[1]["dup_frac"] - round(8 / 13, 4)) < 1e-9


def test_substring_dup_spans_self_repetition_two_islands(spark):
    """The same 5-gram twice WITHIN one doc counts (Lee et al. count
    self-repeats); non-adjacent hits stay separate islands."""
    from cassandra_data_migration_spark.operators.dedup import substring_dup_spans

    rows = [(7, "x1 x2 x3 x4 x5 gap1 x1 x2 x3 x4 x5")]
    (r,) = substring_dup_spans(_docs(spark, rows), k=5).collect()
    assert r["n_tokens"] == 11
    assert r["n_dup_spans"] == 2
    assert r["dup_tokens"] == 10  # [1,5] plus [7,11]


def test_substring_dup_spans_short_doc_zero_row(spark):
    """Docs shorter than k still emit a row (left join), all-zero."""
    from cassandra_data_migration_spark.operators.dedup import substring_dup_spans

    rows = [(9, "t1 t2 t3")]
    (r,) = substring_dup_spans(_docs(spark, rows), k=5).collect()
    assert (r["n_tokens"], r["n_dup_spans"], r["dup_tokens"]) == (3, 0, 0)


def test_substring_dup_spans_overlapping_grams_merge(spark):
    """Overlapping duplicated k-grams union into ONE maximal span —
    the property that makes interval union equal SA substring dedup."""
    from cassandra_data_migration_spark.operators.dedup import substring_dup_spans

    run = "r1 r2 r3 r4 r5 r6"  # 6 tokens -> two overlapping 5-grams
    rows = [(1, f"p1 {run} p2"), (2, f"q1 q2 {run} q3")]
    out = {
        r["doc_id"]: r
        for r in substring_dup_spans(_docs(spark, rows), k=5).collect()
    }
    for d in (1, 2):
        assert out[d]["n_dup_spans"] == 1
        assert out[d]["dup_tokens"] == 6
