"""Catalog-table layer: the reference's Postgres DDL + seed-once guard
(S5, P8) as Spark catalog operations over parquet-backed tables.

Reference mapping:
- S5 ``CREATE TABLE IF NOT EXISTS`` ×3 (main.py:28-82) →
  ``create_table_if_not_exists`` (``USING parquet`` catalog tables —
  swap in a transactional table format on a real deployment for MERGE
  and time travel; the call sites don't change).
- P8 existence predicate — seed only when empty (main.py:256-262,
  voting.py:47-50) → ``seed_once``: ``tableExists`` + ``isEmpty``, no
  driver-side fetch-all.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def create_table_if_not_exists(
    spark: SparkSession,
    name: str,
    schema: StructType,
    partition_by: tuple[str, ...] = (),
) -> None:
    """S5: declarative DDL on the session catalog. Partition columns are
    the at-rest pruning key — at 100 TB choose the columns query filters
    hit (date, shard) so partition pruning bounds every scan."""
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    part = (
        f" PARTITIONED BY ({', '.join(f'`{c}`' for c in partition_by)})"
        if partition_by
        else ""
    )
    spark.sql(f"CREATE TABLE IF NOT EXISTS `{name}` ({ddl}) USING parquet{part}")


def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)


def is_empty(spark: SparkSession, name: str) -> bool:
    return spark.table(name).isEmpty()


def seed_once(
    spark: SparkSession,
    name: str,
    generate: Callable[[SparkSession], DataFrame],
) -> bool:
    """P8: idempotence guard — generate and append only when the table
    is empty (the reference's ``len(candidates)==0`` probe, without
    collecting the table to find out). Returns True if seeding ran."""
    if not is_empty(spark, name):
        return False
    generate(spark).write.mode("append").insertInto(name)
    return True
