"""Physical-plan structural guarantees, enforced over EVERY declared
and extra query (not spot checks):

1. no CartesianProduct anywhere — the only sanctioned cross-join shape
   is the broadcast nested-loop join of a tiny query set against the
   corpus (KNN lanes), which Catalyst plans as BroadcastNestedLoopJoin;
2. no row-at-a-time Python UDF (BatchEvalPython) on any path — every
   Python crossing must be Arrow-batched (ArrowEvalPython /
   MapInPandas / FlatMapCoGroupsInPandas);
3. the flagship scan queries keep their predicate pushdown
   (PushedFilters reaches the parquet scan).

These are the structural claims SCALE.md makes; this test makes them
regressions instead of prose.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, ".")

import __spark_entry__ as entrymod


def _plan(spark, sf_dir, fn) -> str:
    return fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_and_no_rowwise_python_udf(spark, sf_dir):
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    offenders_cart = []
    offenders_py = []
    for name, fn in qs.items():
        plan = _plan(spark, sf_dir, fn)
        if "CartesianProduct" in plan:
            offenders_cart.append(name)
        if "BatchEvalPython" in plan:
            offenders_py.append(name)
    assert not offenders_cart, f"CartesianProduct in: {offenders_cart}"
    assert not offenders_py, f"row-at-a-time Python UDF in: {offenders_py}"


@pytest.mark.parametrize(
    "name,pushed_fragment",
    [
        ("q_tpch_pricing", "LessThanOrEqual(l_shipdate"),
        ("q_tpch_shipmode", "GreaterThanOrEqual(l_shipdate"),
        ("q_tpch_exists", "EqualTo(l_returnflag,R)"),
        ("q_tpch_join_topk", "EqualTo(c_mktsegment,BUILDING)"),
    ],
)
def test_predicate_pushdown_reaches_scan(spark, sf_dir, name, pushed_fragment):
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    plan = _plan(spark, sf_dir, qs[name])
    assert "PushedFilters: [" in plan, f"{name}: no pushed filters at all"
    assert pushed_fragment in plan, f"{name}: expected {pushed_fragment} pushed to scan"
