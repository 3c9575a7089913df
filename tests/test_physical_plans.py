"""Physical-plan regression tests (SURVEY.md §4, SCALING.md).

Correctness tests prove the operators compute the right answer; these
prove they compute it with the right PLAN — pushdown, pruning,
broadcast, partial aggregation.  A regression here is invisible at
sf0.01 and catastrophic at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

import __spark_entry__ as entry_mod
from tests.conftest import SF_CORRECT


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(entry_mod.queries()["filter_eq"](spark, SF_CORRECT))
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)]" in plan


def test_projection_prunes_columns(spark):
    plan = _plan(entry_mod.queries()["projection"](spark, SF_CORRECT))
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>" in plan
    assert "c_acctbal" not in plan  # untouched column never read


def test_fk_join_is_broadcast(spark):
    plan = _plan(entry_mod.queries()["fk_join_enrich"](spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_missing_rows_anti_join_prunes_probe_side(spark):
    plan = _plan(entry_mod.queries()["missing_rows"](spark, SF_CORRECT))
    assert "LeftAnti" in plan
    # probe (target) side only ever needs the pk column
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan


def test_pricing_summary_has_partial_aggregation(spark):
    plan = _plan(entry_mod.queries()["pricing_summary"](spark, SF_CORRECT))
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert "LessThanOrEqual(l_shipdate" in plan  # date predicate pushed


def test_point_lookup_pushes_both_predicates(spark):
    plan = _plan(entry_mod.queries()["point_lookup"](spark, SF_CORRECT))
    assert "EqualTo(l_orderkey,7)" in plan
    assert "EqualTo(l_linenumber,1)" in plan


def test_topk_is_take_ordered_not_global_sort(spark):
    plan = _plan(entry_mod.queries()["limit_n"](spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan
