"""Round-5-session additions: line-wise dedup, incremental LSH index."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, assert_df_matches_oracle


def test_line_dedup_docs_semantics(spark):
    from cassandra_data_migration_spark.operators.text import line_dedup_docs

    rows = [
        # boilerplate line shared by docs 0 and 1 -> removed from both
        (0, "unique content line zero\nshared boilerplate footer line"),
        (1, "another unique line here\nshared boilerplate footer line"),
        # short line "ok" repeats cross-doc but is exempt (<10 chars)
        (2, "ok\nthird document body text"),
        (3, "ok\nfourth document body text"),
        # doc that is ONLY boilerplate must survive with empty text
        (4, "shared boilerplate footer line"),
        # intra-doc repeat is NOT cross-doc: kept (1 distinct doc)
        (5, "repeat me inside this doc\nrepeat me inside this doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in line_dedup_docs(df, min_docs=2, min_chars=10).collect()
    }
    assert len(out) == 6
    assert out[0]["clean_text"] == "unique content line zero"
    assert out[0]["n_kept"] == 1 and out[0]["n_removed"] == 1
    assert out[1]["clean_text"] == "another unique line here"
    assert out[2]["clean_text"] == "ok\nthird document body text"
    assert out[2]["n_removed"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_kept"] == 0
    assert out[4]["n_removed"] == 1
    assert (
        out[5]["clean_text"]
        == "repeat me inside this doc\nrepeat me inside this doc"
    )


def test_line_dedup_preserves_line_order(spark):
    from cassandra_data_migration_spark.operators.text import line_dedup_docs

    # many lines so a shuffled collect_list would scramble without the
    # array_sort(struct(pos, line)) ordering
    lines = [f"distinct content line number {i:03d}" for i in range(40)]
    df = spark.createDataFrame(
        [(7, "\n".join(lines))], "doc_id long, text string"
    ).repartition(8)
    out = line_dedup_docs(df).collect()[0]
    assert out["clean_text"] == "\n".join(lines)
    assert out["n_kept"] == 40


def test_line_dedup_docs_oracle(spark, duck):
    import __spark_entry__ as m

    assert_df_matches_oracle(
        m.queries()["line_dedup_docs"](spark, SF_CORRECT),
        duck,
        m.oracle_sql()["line_dedup_docs"],
    )
