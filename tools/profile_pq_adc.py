"""Stage-level attribution of knn_pq_adc's cost (r8 verdict #2).

The panel showed 0.386 -> 0.893 s across r5 -> r8; quiet min-of-4 said
~0.87 s was real. This profiler decomposes the query into its component
jobs on the bench corpus (sf0.1, 2,000 vectors) and times candidate
plan variants, so SCALE.md can attribute the drift per stage instead of
guessing. Run on a QUIET machine (prints loadavg so the reading defends
itself).

Outcome (r9, recorded in SCALE.md "Round-9 knn_pq_adc attribution"):
~0.15-0.2 s was the justified r7 correctness boundary; ~0.25 s was the
two-kernel operator shape, closed by fusing encode+score into one Arrow
kernel — `variant_current` below now exercises the FUSED operator, so
this tool doubles as the regression probe for it (quiet band
0.625-0.681 s). `variant_pushed_queries` was tried and REJECTED: the
vec_id filter is already pushed below the unique_by_id window into the
parquet scan (Catalyst pushes predicates on window partition keys), so
dedup-after-filter only adds plan nodes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from realtime_voting_data_engineering_spark.operators import similarity as S  # noqa: E402
from realtime_voting_data_engineering_spark.session import get_spark  # noqa: E402
from realtime_voting_data_engineering_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"
RUNS = 4


def timed(label: str, thunk, runs: int = RUNS) -> float:
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        thunk()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label:55s} {best:7.3f} s (min of {runs})")
    return best


def variant_current(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = S.unique_by_id(emb, dims=64)
    return S.knn_pq_adc(
        corpus.filter(F.col("vec_id").between(0, 9)).limit(10), corpus,
        dims=64, m=8, ksub=16, k=5,
    )


def variant_pushed_queries(spark, sf_dir):
    """Queries deduped AFTER the id filter: window over <=10 ids instead
    of the full corpus (filter-then-dedup == dedup-then-filter when the
    window partitions by the filtered id)."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = S.unique_by_id(emb, dims=64)
    queries = S.unique_by_id(
        emb.filter(F.col("vec_id").between(0, 9)), dims=64
    ).limit(10)
    return S.knn_pq_adc(queries, corpus, dims=64, m=8, ksub=16, k=5)


def main() -> None:
    print("loadavg:", os.getloadavg())
    spark = get_spark(app_name="profile-pq-adc")
    spark.range(1).count()

    # codegen warmup at the smallest SF for every plan shape used below
    for v in (variant_current, variant_pushed_queries):
        v(spark, WARM_DIR).collect()

    emb = load_table(spark, SF_DIR, "embeddings")
    print(f"corpus rows: {emb.count()}")

    print("\n-- component jobs (sf0.1) --")
    # raw scan floor
    timed("scan+count embeddings", lambda: emb.count())
    # the validity filter alone (exists() over 64 floats per row)
    timed("valid_vectors.count", lambda: S.valid_vectors(emb, dims=64).count())
    # the id-uniqueness window over the full corpus
    uniq = S.unique_by_id(emb, dims=64)
    timed("unique_by_id.count (window)", lambda: uniq.count())
    # job A of knn_pq_adc: the query-side collect through the FULL-corpus
    # window (current registration shape)
    qcur = S.valid_vectors(
        uniq.filter(F.col("vec_id").between(0, 9)).limit(10), dims=64
    )
    timed("queries collect (via full-corpus window)",
          lambda: qcur.select("vec_id", "embedding").collect())
    # job A, pushed: dedup after the filter
    qpush = S.valid_vectors(
        S.unique_by_id(emb.filter(F.col("vec_id").between(0, 9)), dims=64)
        .limit(10),
        dims=64,
    )
    timed("queries collect (filter-then-dedup)",
          lambda: qpush.select("vec_id", "embedding").collect())
    # job B: encode kernel over the deduped corpus
    codes = S.pq_encode(uniq, dims=64, m=8, ksub=16)
    timed("pq_encode.count (window+kernel)", lambda: codes.count())
    # encode without the uniqueness window (kernel floor)
    codes_nowin = S.pq_encode(S.valid_vectors(emb, dims=64), dims=64, m=8, ksub=16)
    timed("pq_encode.count (no window)", lambda: codes_nowin.count())

    print("\n-- end-to-end variants (sf0.1) --")
    timed("CURRENT: dedup corpus, filter for queries",
          lambda: variant_current(spark, SF_DIR).collect())
    timed("PUSHED: filter-then-dedup queries",
          lambda: variant_pushed_queries(spark, SF_DIR).collect())

    print("\nloadavg:", os.getloadavg())


if __name__ == "__main__":
    main()
