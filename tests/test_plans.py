"""Physical-plan audits: the scale properties the engine promises —
filter/projection pushdown into parquet scans, broadcast joins for dims,
TakeOrderedAndProject for top-k, partial (map-side) aggregation — are
asserted on the actual plans, so a regression that silently de-optimizes
a query fails CI, not the 100 TB run."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame

from realtime_voting_data_engineering_spark import queries as Q


def plan_of(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _q(spark, sf_dir, name: str) -> str:
    return plan_of(Q.REGISTRY[name].fn(spark, sf_dir))


def test_q1_filter_and_projection_pushdown(spark, sf_dir):
    plan = _q(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # Only the 7 needed columns reach the scan — no full-width read.
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    assert "l_quantity" in read_schema and "l_returnflag" in read_schema


def test_q6_all_predicates_pushed(spark, sf_dir):
    plan = _q(spark, sf_dir, "q6_forecast_revenue")
    for pushed in ("l_shipdate", "l_discount", "l_quantity"):
        assert any(
            pushed in l for l in plan.splitlines() if "PushedFilters" in l
        ), f"{pushed} not pushed"


def test_q5_dims_broadcast(spark, sf_dir):
    plan = _q(spark, sf_dir, "q5_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastExchange" in plan


def test_q3_topk_is_take_ordered(spark, sf_dir):
    plan = _q(spark, sf_dir, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan


def test_votes_per_candidate_has_partial_aggregation(spark, sf_dir):
    plan = _q(spark, sf_dir, "votes_per_candidate")
    # partial + final HashAggregate around one exchange: map-side combine.
    assert "partial_count" in plan and "partial_sum" in plan
    assert "hashpartitioning(event_type" in plan


def test_turnout_join_broadcasts_dim_not_fact(spark, sf_dir):
    plan = _q(spark, sf_dir, "turnout_per_location")
    assert "BroadcastHashJoin" in plan
    # The customer fact side must not feed a BroadcastExchange.
    assert "SortMergeJoin" not in plan


def test_q19_derives_single_side_residuals(spark, sf_dir):
    """The OR-of-ANDs must still yield per-table pushed residuals
    (brand/size on part) rather than filtering only post-join."""
    plan = _q(spark, sf_dir, "q19_disjunctive_revenue")
    pushed_lines = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("p_brand" in l or "p_size" in l for l in pushed_lines)


def test_whole_stage_codegen_active(spark, sf_dir):
    """AQE only finalizes codegen spans at execution time — run the
    query, then assert the executed plan wraps the scan→filter→partial
    aggregate pipeline in WholeStageCodegen."""
    df = Q.REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    df.collect()
    plan = plan_of(df)
    # formatted mode stars codegen-compiled nodes
    assert "* HashAggregate" in plan and "* Filter" in plan
    assert "Final Plan" in plan


def test_no_python_udfs_or_cartesian_in_oracled_queries(spark):
    """Engine-wide plan lint: every SQL-expressible (oracled) query must
    stay JVM-side — no BatchEvalPython (row-at-a-time Python UDF) — and
    must not plan a CartesianProduct. Catches a hot-path de-optimization
    anywhere in the registry the moment it lands."""
    sf = "/root/testdata/sf0.001"
    offenders = {}
    for name, spec in Q.REGISTRY.items():
        if spec.oracle is None:
            continue
        plan = plan_of(spec.fn(spark, sf))
        bad = [
            marker
            for marker in ("BatchEvalPython", "CartesianProduct")
            if marker in plan
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders
