"""SparkSession bootstrap tuned for the engine.

The reference builds its session at spark_stream.py:8-12 with a misspelled
AQE key (``spark.sql.adaptive.enable``) that silently leaves AQE at its
default. We configure deliberately:

- AQE on (coalesce shuffle partitions, skew-join handling at scale).
- Arrow on (vectorized pandas boundary for the few pandas-UDF kernels).
- Session timezone pinned to UTC so timestamp semantics match a
  UTC-naive oracle (DuckDB) and are cluster-location independent.
- ``spark.sql.shuffle.partitions`` sized from the env, not the 200
  default — right for local[N]; on a real cluster this is overridden per
  deployment (AQE coalescing makes the initial number less critical).
"""

from __future__ import annotations

import os
import pathlib
import tempfile
import threading
import zipfile

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "realtime-voting-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Scale note: in local mode the driver is the only JVM so
    ``spark.driver.memory`` must be set before JVM launch (spark-submit /
    env); on a cluster these configs ride along unchanged and AQE adapts
    shuffle partitioning at runtime.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Corpus `events.ts` is parquet TIMESTAMP(NANOS); Spark has no
        # nanos timestamp type — read as long, convert at the source
        # (sources/tables.py) by truncating to micros like DuckDB does.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Safe pandas→Arrow conversion in Python workers: an
        # out-of-range value crossing into a narrower output-schema
        # type raises in the task instead of silently WRAPPING
        # (default false let int64 2^33+7 become int32 7 — the id
        # corruption class ADVICE r10 #1 verified). Runtime-settable;
        # also pinned in sources/tables.py:ensure_session_confs so the
        # driver's vanilla session gets it too.
        .config("spark.sql.execution.pandas.convertToArrowArraySafely", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    if master is not None:
        builder = builder.master(master)
    elif os.environ.get("SPARK_GRAFT_MASTER"):
        builder = builder.master(os.environ["SPARK_GRAFT_MASTER"])
    else:
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    Any operator that sends a closure to workers (mapInPandas /
    pandas_udf kernels) references this package by module name; workers
    launched by a driver that merely ``sys.path``-hacked the repo (e.g.
    the grading harness running from another cwd) cannot import it and
    fail with ModuleNotFoundError. Zipping the package once per session
    and registering it makes the kernels importable everywhere — local
    workers and real executors alike. Idempotent per SparkContext.
    """
    sc = spark.sparkContext
    if getattr(sc, "_rtv_pkg_shipped", False):
        return
    with _PKG_SHIP_LOCK:  # concurrent first kernels would double-ship
        if getattr(sc, "_rtv_pkg_shipped", False):
            return
        pkg_dir = pathlib.Path(__file__).resolve().parent
        root = pkg_dir.parent
        fd, zpath = tempfile.mkstemp(prefix="rtv_pkg_", suffix=".zip")
        os.close(fd)
        with zipfile.ZipFile(zpath, "w") as z:
            for p in sorted(pkg_dir.rglob("*.py")):
                z.write(p, str(p.relative_to(root)))
        sc.addPyFile(zpath)
        sc._rtv_pkg_shipped = True


#: Double-checked-locking guard for ensure_workers_can_import: two
#: threads' first Arrow-kernel queries on a fresh shared session would
#: otherwise each zip and addPyFile the package (wasted shipping, and
#: workers importing from whichever copy lands last).
_PKG_SHIP_LOCK = threading.Lock()
