"""Every registered query vs its DuckDB oracle — the local replica of the
driver's t2 gate (BASELINE.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_voting_data_engineering_spark import queries as Q
from tests.oracle_harness import compare_query

_ORACLE_CASES = sorted(n for n, s in Q.REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("name", _ORACLE_CASES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = Q.REGISTRY[name]
    compare_query(spark, name, spec.fn, spec.oracle, sf_dir)


def test_all_queries_return_rows(spark, sf_smoke):
    for name, spec in Q.REGISTRY.items():
        df = spec.fn(spark, sf_smoke)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"event_type", "total_votes", "total_value"}


def test_salted_join_matches_plain_join(spark, sf_dir):
    from realtime_voting_data_engineering_spark.operators.relational import salted_join
    from realtime_voting_data_engineering_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    plain = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .count()
        .collect()
    )
    salted = (
        salted_join(
            li.withColumnRenamed("l_partkey", "p_partkey"),
            part,
            key="p_partkey",
            row_key="l_orderkey",
            n_salts=8,
        )
        .groupBy("p_brand")
        .count()
        .collect()
    )
    assert {(r.p_brand, r["count"]) for r in plain} == {
        (r.p_brand, r["count"]) for r in salted
    }


def test_approx_distinct_within_rsd(spark, sf_dir):
    from realtime_voting_data_engineering_spark import queries as Q
    from realtime_voting_data_engineering_spark.sources.tables import load_table

    approx = {
        r.event_type: r.approx_users
        for r in Q.REGISTRY["approx_distinct_users"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) / n < 0.05, (et, approx[et], n)


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    from realtime_voting_data_engineering_spark import queries as Q

    approx = {
        r.event_type: (r.q1, r.median, r.q3)
        for r in Q.REGISTRY["approx_value_quartiles"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: (r.q1, r.median, r.q3)
        for r in Q.REGISTRY["value_quartiles_by_type"].fn(spark, sf_dir).collect()
    }
    for et, (q1, med, q3) in exact.items():
        a1, amed, a3 = approx[et]
        for a, e in ((a1, q1), (amed, med), (a3, q3)):
            assert abs(a - e) <= max(0.5, 0.02 * abs(e)), (et, a, e)
