"""At-rest layout control: partitioned and bucketed tables — the two
levers that turn 100 TB scans into pruned, shuffle-free plans.

- **Partitioning** (hive-style directories) makes query filters on the
  partition columns prune entire directories at planning time
  (``PartitionFilters`` in the scan, zero I/O for pruned partitions).
  Choose the columns query predicates actually hit: event date, region.
- **Bucketing** pre-shuffles a table by key into a fixed number of
  buckets at write time. Two tables bucketed on the same key with the
  same bucket count equi-join with NO exchange on either side — the
  shuffle is paid once at ingest instead of per query. This is the
  co-located fact-fact join SCALE.md prescribes for lineitem⋈orders.

The reference has no layout control at all (Postgres heap + Kafka topic
order); this module is where its tables land when rebuilt for scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...],
    mode: str = "overwrite",
) -> None:
    """Write a hive-partitioned parquet dataset. Filters on
    ``partition_cols`` become planning-time directory pruning for every
    subsequent reader."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write a bucketed catalog table (bucketing metadata lives in the
    catalog, so this is ``saveAsTable``, not a path write). Sorting
    within buckets additionally enables exchange-AND-sort-free
    sort-merge joins."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> bool:
    """True when both catalog tables exist (bucket compatibility is
    enforced by Spark at plan time — matching keys and bucket counts
    yield exchange-free joins)."""
    return spark.catalog.tableExists(left) and spark.catalog.tableExists(right)
