"""Source-layer behavior: catalog DDL + seed-once guard, JDBC gating,
rate-source vote stream."""

from __future__ import annotations

import time
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from realtime_voting_data_engineering_spark.sources import catalog as C
from realtime_voting_data_engineering_spark.sources import jdbc as J
from realtime_voting_data_engineering_spark.sources import rate as RT


@pytest.fixture()
def table_name(spark):
    name = f"t_{uuid.uuid4().hex[:8]}"
    yield name
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")


def test_catalog_create_and_seed_once(spark, table_name):
    schema = T.StructType(
        [
            T.StructField("candidate_id", T.StringType()),
            T.StructField("candidate_name", T.StringType()),
        ]
    )
    C.create_table_if_not_exists(spark, table_name, schema)
    assert C.table_exists(spark, table_name)
    assert C.is_empty(spark, table_name)
    # DDL is idempotent
    C.create_table_if_not_exists(spark, table_name, schema)

    def gen(s):
        return s.createDataFrame([("c1", "Ada"), ("c2", "Grace")], schema)

    assert C.seed_once(spark, table_name, gen) is True
    assert spark.table(table_name).count() == 2
    # second seed is a no-op — the reference's len(candidates)==0 guard
    assert C.seed_once(spark, table_name, gen) is False
    assert spark.table(table_name).count() == 2


def test_jdbc_gating_raises_clear_error(spark):
    with pytest.raises(J.JdbcUnavailableError):
        J.read_table(spark, "jdbc:postgresql://nohost:5432/db", "candidates").collect()
    with pytest.raises(J.JdbcUnavailableError):
        J.write_table(
            spark.range(3), "jdbc:postgresql://nohost:5432/db", "votes"
        )


def test_rate_source_vote_stream(spark, tmp_path):
    votes = RT.vote_rate_stream(spark, rows_per_second=50, n_candidates=3)
    assert votes.isStreaming
    assert set(votes.columns) == {"voter_id", "candidate_id", "voting_time", "vote"}
    q = (
        votes.writeStream.format("memory")
        .queryName("rate_votes")
        .option("checkpointLocation", str(tmp_path / "ckpt_rate"))
        .start()
    )
    try:
        # generous deadline: under full-suite load micro-batches can lag
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.sql("SELECT * FROM rate_votes").count() >= 10:
                break
            time.sleep(0.5)
    finally:
        # stop BEFORE asserting: the memory sink grows between actions,
        # so two counts on a live stream see different snapshots
        q.stop()
    rows = spark.sql("SELECT * FROM rate_votes").collect()
    assert len(rows) >= 10, f"only {len(rows)} rows; status={q.status}"
    assert {r.candidate_id for r in rows} <= {"cand-0", "cand-1", "cand-2"}
    # deterministic-per-voter: same voter never maps to two candidates
    pairs = {(r.voter_id, r.candidate_id) for r in rows}
    assert len(pairs) == len({r.voter_id for r in rows})


def test_safe_arrow_conversion_is_pinned_and_loud(spark):
    """``ensure_session_confs`` pins
    ``spark.sql.execution.pandas.convertToArrowArraySafely=true``: a
    Pandas kernel emitting an out-of-range value into a narrower
    output-schema type must FAIL the task, not silently wrap (the
    default false turned int64 2^33+7 into int32 7 — ADVICE r10 #1's
    id-corruption class; every registered query passes through
    load_table, so the driver's vanilla session gets the pin too).
    Anti-vacuity: the same kernel under the unsafe default returns the
    wrapped value — proving the conf, not the cast, is what's loud."""
    import pandas as pd

    from realtime_voting_data_engineering_spark.sources.tables import (
        ensure_session_confs,
    )

    ensure_session_confs(spark)
    conf = "spark.sql.execution.pandas.convertToArrowArraySafely"
    assert spark.conf.get(conf) == "true"

    def emit(_batches):
        yield pd.DataFrame({"x": [(1 << 33) + 7]})

    # coalesce(1): the kernel yields one frame per PARTITION, so a
    # multi-partition range would emit one wrapped row per partition.
    one = spark.range(1).coalesce(1)
    with pytest.raises(Exception, match="(?i)overflow|invalid|unsafe|conver"):
        one.mapInPandas(emit, schema="x int").collect()
    try:
        spark.conf.set(conf, "false")
        wrapped = one.mapInPandas(emit, schema="x int").collect()
        assert [r.x for r in wrapped] == [7], "wrap class gone — update pin"
    finally:
        spark.conf.set(conf, "true")
