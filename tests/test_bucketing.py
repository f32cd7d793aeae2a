"""Bucketed co-located join (operators/bucketing.py, J12): the point
is the PLAN — same answer as the shuffle join, zero Exchange and zero
Sort on the join key."""

from __future__ import annotations

from data_warehouse_spark.queries.registry import load_all

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_j12_matches_j11_and_joins_without_exchange(spark):
    specs = load_all()
    j11 = specs["j11_fact_fact_join"].fn(spark, SF_SMOKE)
    j12 = specs["j12_bucketed_fact_join"].fn(spark, SF_SMOKE)

    rows11 = {tuple(r) for r in j11.collect()}
    rows12 = {tuple(r) for r in j12.collect()}
    assert rows12 == rows11 and rows12

    # at the smoke SF, AQE turns the join into a broadcast (correct at
    # that size); pin the fact-x-fact regime to assert the bucketed
    # sort-merge shape the layout exists for
    thresholds = ["spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.adaptive.autoBroadcastJoinThreshold"]
    saved = {c: spark.conf.get(c, None) for c in thresholds}
    for c in thresholds:
        spark.conf.set(c, "-1")
    try:
        j12 = specs["j12_bucketed_fact_join"].fn(spark, SF_SMOKE)
        j12.collect()
        plan = _plan(j12)
    finally:
        for c, v in saved.items():
            spark.conf.set(c, v) if v is not None else spark.conf.unset(c)
    assert "SortMergeJoin" in plan
    # the one-off bucketed write already clustered both sides: the join
    # key must never appear in a runtime exchange or sort
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Sort [l_orderkey" not in plan
    assert "Sort [o_orderkey" not in plan
    # the final 5-group aggregate is the only shuffle left
    assert plan.count("Exchange") <= 2  # agg exchange (+AQE read wrapper)
