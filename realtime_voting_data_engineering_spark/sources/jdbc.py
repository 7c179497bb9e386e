"""JDBC source/sink adapters (reference S5-S7) behind availability
gating, mirroring the Kafka adapters: the engine's semantics never
depend on a JDBC database — Postgres in the reference deployment is an
edge store, and every operator is exercisable from parquet.

Reference mapping:
- S5 DDL ``CREATE TABLE IF NOT EXISTS`` ×3 (main.py:33-79) →
  ``sources.catalog`` for the engine's own tables; JDBC DDL belongs to
  the external DB.
- S6 row-at-a-time INSERT + commit-per-row (main.py:123-140,184-213;
  voting.py:78-82) → ``write_table``: one distributed, batched append —
  executors write partitions concurrently, no per-row commits.
- S7 fetch-all scan ``SELECT * FROM candidates`` (main.py:256-257;
  voting.py:41-45) → ``read_table``/``read_query`` with partitioned
  reads for big tables (predicate-ranged parallel scans).

No JDBC driver jar ships in the test image, so failures surface as
``JdbcUnavailableError`` with the underlying cause; unit tests exercise
argument plumbing only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class JdbcUnavailableError(RuntimeError):
    pass


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """S7: scan a JDBC table. With a numeric ``partition_column`` and
    bounds, Spark issues ``num_partitions`` range-predicate queries in
    parallel — the scale path; unbounded reads are single-connection."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    try:
        return reader.load()
    except Exception as exc:
        raise JdbcUnavailableError(f"JDBC read failed (driver jar missing?): {exc}") from exc


def read_query(
    spark: SparkSession,
    url: str,
    query: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S7 variant: server-side query pushdown (the reference's
    ``row_to_json`` subselect, voting.py:41-45, becomes a plain query —
    JSON encoding is the engine's job via ``to_json(struct('*'))``)."""
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:
        raise JdbcUnavailableError(f"JDBC read failed (driver jar missing?): {exc}") from exc


def write_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
) -> None:
    """S6: batched distributed append — replaces the reference's
    commit-per-row producer loop. ``batchsize`` controls rows per JDBC
    batch statement; partitions write concurrently."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    try:
        writer.save()
    except Exception as exc:
        raise JdbcUnavailableError(f"JDBC write failed (driver jar missing?): {exc}") from exc


def foreach_batch_jdbc(
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
):
    """S6 streaming form: a ``foreachBatch`` function appending each
    micro-batch to a JDBC table — batched, idempotence left to a keyed
    MERGE/upsert on the database side (or use
    ``streaming.pipeline.foreach_batch_upsert`` for engine-owned
    latest-per-key parquet serving)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        write_table(batch_df, url, table, mode="append", properties=properties)

    return sink
