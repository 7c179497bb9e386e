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


# --- staged-swap maintenance (crash-safe in-place rewrites) -----------------


def _hadoop(spark: SparkSession, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    mk = jvm.org.apache.hadoop.fs.Path
    fs = mk(path).getFileSystem(conf)
    return fs, mk


def read_current(spark: SparkSession, target_path: str) -> DataFrame | None:
    """Current state of a staged-swap-maintained parquet dir: the target,
    or — if a previous rewrite crashed mid-swap — the newest __old/__stage
    snapshot left behind. None if nothing readable exists yet."""
    fs, mk = _hadoop(spark, target_path)
    candidates = [target_path]
    for suffix in ("__old_epoch", "__stage_epoch"):
        stats = fs.globStatus(mk(f"{target_path}{suffix}*"))
        if stats:
            paths = sorted(
                (s.getPath().toString() for s in stats),
                key=lambda p: int(p.rsplit("epoch", 1)[1]),
            )
            candidates.append(paths[-1])
    for path in candidates:
        try:
            return spark.read.parquet(path)
        except Exception:
            continue
    return None


def staged_swap_write(df: DataFrame, target_path: str, epoch_id: int) -> None:
    """Rewrite ``target_path`` with ``df`` WITHOUT overwriting files the
    plan may still be reading: fully materialize to a stage path (its
    scan reads the OLD target, which nothing is deleting), then swap
    directories with two renames — atomic on HDFS/local filesystems; on
    object stores use a transactional table format instead. Leftover
    snapshots from this or earlier crashed rewrites are cleaned on
    success; ``read_current`` recovers from a crash between the renames."""
    spark = df.sparkSession
    fs, mk = _hadoop(spark, target_path)
    stage = f"{target_path}__stage_epoch{epoch_id}"
    old = f"{target_path}__old_epoch{epoch_id}"
    # A crashed earlier attempt at THIS epoch may have left old/stage dirs;
    # Hadoop rename into an existing dir nests instead of replacing and
    # reports failure only via a False return, so clear them up front and
    # treat any False rename as fatal rather than silently proceeding to
    # the cleanup loop (which would delete the snapshots we rely on).
    for leftover in (old, stage):
        if fs.exists(mk(leftover)):
            fs.delete(mk(leftover), True)
    df.write.mode("overwrite").parquet(stage)
    if fs.exists(mk(target_path)):
        if not fs.rename(mk(target_path), mk(old)):
            raise IOError(f"rename {target_path} -> {old} failed")
    if not fs.rename(mk(stage), mk(target_path)):
        raise IOError(f"rename {stage} -> {target_path} failed")
    for suffix in ("__old_epoch", "__stage_epoch"):
        for s in fs.globStatus(mk(f"{target_path}{suffix}*")):
            fs.delete(s.getPath(), True)


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes of the parquet files under ``path`` (recursive)."""
    fs, mk = _hadoop(spark, path)
    total = 0
    it = fs.listFiles(mk(path), True)
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total += f.getLen()
    return total


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    epoch_id: int = 0,
) -> int:
    """Small-file compaction — the maintenance pass every streaming sink
    needs: micro-batches fragment a dataset into files far smaller than
    a scan-efficient split, and at 100 TB file-count, not byte-count,
    becomes the scan/list bottleneck. Rewrites the dataset into
    ``ceil(bytes / target_file_bytes)`` files via the crash-safe staged
    swap. Returns the output file count. Row-group-aligned ~128 MB files
    are the parquet sweet spot for both scan parallelism and footer
    overhead."""
    total = dataset_bytes(spark, path)
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    staged_swap_write(df.repartition(n_files), path, epoch_id)
    return n_files
