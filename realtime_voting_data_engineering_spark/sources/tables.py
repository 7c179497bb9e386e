"""Batch table source: partitioned parquet, schema-on-read.

Replaces the reference's Postgres DDL + fetch-all scans
(main.py:33-79, main.py:256-257, voting.py:41-45) with columnar parquet
scans that Catalyst can push filters and projections into. At 100 TB the
same call reads a partitioned/table-format dataset; nothing here collects
to the driver.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Driver-generated corpus tables (TESTDATA.md).
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as long
#: (``spark.sql.legacy.parquet.nanosAsLong``); we truncate to micros,
#: matching DuckDB's nanos→micros truncation, so both engines see the
#: same timestamp values.
NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def ensure_session_confs(spark: SparkSession) -> None:
    """Defensively set the runtime-settable confs this engine's semantics
    depend on. The driver harness supplies its *own* SparkSession — a
    vanilla one rejects TIMESTAMP(NANOS) parquet and may carry a
    non-UTC session timezone, so we pin both here rather than relying on
    our session builder having been used."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Loud-not-wrong for every Pandas kernel: with the default (false),
    # a worker-side pandas→Arrow conversion into a narrower output
    # type silently WRAPS out-of-range values (verified: int64 2^33+7
    # → int32 7 — ADVICE r10 #1's id-corruption class). True makes the
    # task fail instead. Plan-time guards (e.g. similarity.
    # _require_same_id_type) remain the first line — a scheduler-visible
    # refusal beats a mid-job executor error — but this closes the class
    # for kernels without a guard, under the driver's vanilla session
    # too (every registered query passes through load_table).
    spark.conf.set(
        "spark.sql.execution.pandas.convertToArrowArraySafely", "true"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table. Plain parquet scan — predicate pushdown and
    column pruning happen automatically when callers filter/select."""
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in NANO_TS_COLUMNS.get(name, ()):
        dtype = dict(df.dtypes).get(col)
        if dtype == "bigint":
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
        elif dtype == "timestamp_ntz":
            # ``nanosAsLong`` is only honored when set BEFORE the session
            # starts (builder-time). The driver's vanilla session sets it
            # too late, so Spark reads TIMESTAMP(NANOS) as micros-truncated
            # TIMESTAMP_NTZ instead. Cast to the canonical session-TZ
            # timestamp (UTC pinned above → identical wall-clock values to
            # the bigint path) so downstream code sees ONE type — functions
            # like ``unix_micros`` require TIMESTAMP and reject NTZ.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with the event-time validity window applied at the
    source: ``ts`` outside [EVENT_TS_LO, EVENT_TS_HI) folds to NULL
    (``functions.scalar.valid_event_ts`` — see its rationale: grid
    explosion, driver-boundary range, calendar-rebase divergence). Every
    time-consuming registered query loads events THROUGH this boundary;
    oracles mirror it with an ``ev`` CTE inlining ``ORACLE_VALID_TS``.
    Queries that never touch ``ts`` keep plain ``load_table`` (the fold
    would be dead code Catalyst prunes anyway, but the contract is
    clearer stated at the call site)."""
    from realtime_voting_data_engineering_spark.functions.scalar import (
        valid_event_ts,
    )

    events = load_table(spark, sf_dir, "events")
    return events.withColumn("ts", valid_event_ts(F.col("ts")))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for the SQL API.

    Temp views are SESSION-global named state: concurrent callers
    binding the same names to DIFFERENT sf_dirs cross-talk. SQL-API
    query paths must go through ``sql_over_views`` (atomic
    register+analyze) rather than calling this and ``spark.sql``
    separately."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


#: Serializes register_views + analysis for SQL-API queries. The corpus
#: views are per-SESSION named state; two threads serving different
#: sf_dirs through one shared session (tools/concurrency_audit.py's
#: mixed-corpus leg) would otherwise race view registration against
#: name resolution and silently read each other's tables.
_SQL_VIEW_LOCK = threading.Lock()


def sql_over_views(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Run a SQL string over the corpus views, safely under concurrency:
    view registration and analysis happen atomically. ``spark.sql``
    analyzes eagerly (Dataset.ofRows asserts analysis), at which point
    the views are INLINED into the plan — after the lock releases, a
    competing re-registration cannot retarget this DataFrame; the
    ``.schema`` touch is belt-and-braces against that eagerness ever
    becoming lazy."""
    with _SQL_VIEW_LOCK:
        register_views(spark, sf_dir)
        df = spark.sql(sql)
        df.schema
    return df
