"""Physical-plan quality guards: the properties that keep these plans
fast at 100 TB must survive refactors — assert them on the executed/
optimized plans, not by eyeball.

(Plan strings come from the JVM; these tests pin the load-bearing
physical features: scan pushdown, column pruning, broadcast joins,
top-k rewrite, partial aggregation.)
"""

from __future__ import annotations

from etl_data_peri_institute_spark.plans import catalog

catalog.load_all()

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = catalog.QUERIES[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: unused columns must not be read
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]
    # partial aggregation before the shuffle
    assert "partial_sum" in plan


def test_q3_broadcast_and_topk(spark):
    plan = _plan(spark, "q3_top_revenue_orders")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # no full global sort for top-k


def test_prefix_filter_pushes_startswith(spark):
    plan = _plan(spark, "p_prefix_filter")
    assert "StringStartsWith(p_name,red)" in plan


def test_semi_join_is_broadcast(spark):
    plan = _plan(spark, "p_semi_join_valid_keys")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_knn_broadcasts_queries(spark):
    plan = _plan(spark, "e_knn_bruteforce")
    assert "Broadcast" in plan  # query side broadcast, corpus stays partitioned


def test_no_cartesian_in_joins(spark):
    # every equi-join query must avoid CartesianProduct (BroadcastNestedLoop
    # is expected only for the explicit cross/range joins)
    for name in ["q5_local_supplier_volume", "q10_returned_items", "j_full_outer"]:
        assert "CartesianProduct" not in _plan(spark, name), name
