"""Data-quality constraint suite: crafted violations of every check
kind, plan shape of the folded row-local pass."""

from __future__ import annotations

from cassandra_data_migration_spark.operators import quality as dq


def _report(spark, df, checks):
    return {
        r["check_name"]: (r["violations"], r["n_rows"], r["passed"])
        for r in dq.dq_report(df, checks).collect()
    }


def test_each_check_kind_counts_its_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "O", "1-URGENT", 1),
            (2, -5.0, "X", "bad", 1),      # range, in_set, regex violations
            (3, None, "F", "2-HIGH", 2),   # range violation (null)
            (3, 20.0, "P", "3-LOW", None), # dup key + null fk
            (4, 30.0, "O", "4-LOW", 99),   # orphan fk
        ],
        "k long, price double, status string, prio string, cust long",
    )
    dim = spark.createDataFrame([(1,), (2,)], ["ckey"])
    got = _report(
        spark,
        df,
        [
            dq.not_null("cust"),
            dq.in_range("price", 0.0, 100.0),
            dq.in_set("status", ["O", "F", "P"]),
            dq.matches("prio", "^[0-9]-"),
            dq.unique("k"),
            dq.foreign_key("cust", dim, "ckey"),
        ],
    )
    assert got["not_null(cust)"] == (1, 5, False)
    assert got["range(price)"] == (2, 5, False)   # -5 and NULL
    assert got["in_set(status)"] == (1, 5, False)
    assert got["regex(prio)"] == (1, 5, False)
    assert got["unique(k)"] == (1, 5, False)      # k=3 twice
    # fk violations: cust=NULL and cust=99 both fail the anti-join
    assert got["fk(cust)"] == (2, 5, False)


def test_clean_table_passes_everything(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    got = _report(
        spark, df, [dq.not_null("v"), dq.unique("k"), dq.in_set("v", ["a", "b", "c"])]
    )
    assert all(v[0] == 0 and v[2] for v in got.values())


def test_row_local_checks_share_one_aggregation(spark):
    df = spark.createDataFrame([(1, 2.0)], "a long, b double")
    plan = (
        dq.dq_report(df, [dq.not_null("a"), dq.in_range("b", 0.0, 1.0)])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # one Aggregate for N row-local checks — no per-check scan
    assert plan.count("Aggregate") == 1


def test_expect_generic_predicate_and_null_semantics(spark):
    df = spark.createDataFrame(
        [(1, "O", 10.0), (2, "F", -5.0), (3, "O", None)],
        "k long, status string, price double",
    )
    got = _report(
        spark,
        df,
        [
            dq.expect("positive_open", "status != 'O' OR price > 0"),
        ],
    )
    # row 2: F, passes; row 1: O with price>0 passes; row 3: O with
    # NULL price → predicate NULL → violation (constraint semantics)
    assert got["expect(positive_open)"] == (1, 3, False)
