"""Concurrent-execution audit: correctness when ONE shared SparkSession
serves many queries at once — the eighth adversary class after NULLs,
non-finite floats, row order, extreme values, degenerate layouts,
composed fuzz, and host timezones.

A 100 TB deployment is multi-tenant by default: a Thrift server,
notebook gateway, or serving tier funnels concurrent requests through a
shared session. Spark's own engine is thread-safe; the hazards are in
OUR Python-side shared state — the BM25 index memo (check-evict-insert
sequences a second thread can interleave), session-global temp views
(two corpora racing for the same names), and one-time per-context setup
(package shipping). Each has a lock-protected design; this audit
hammers them and the whole registry from a thread pool and requires
bit-identical answers to the sequential run.

Legs:

- **A (concurrent engine-vs-oracle):** every oracled query submitted to
  an 8-thread pool over one shared session, two seeded-shuffled rounds;
  each must still match its DuckDB oracle exactly as it does
  sequentially.
- **B (memo stress):** 8 threads × 6 iterations hammer
  ``bm25_search_topk`` alternating two corpora. Every result must
  hash-equal its corpus's sequential reference; afterwards the memo
  must hold EXACTLY one entry per (session, corpus) and the JVM's
  persisted-RDD count must equal the live projections — a lost
  insert race that leaks a persisted duplicate index fails here.
- **B2 (eviction-race storm):** the hammer repeats while a mutator
  thread rewrites the corpus mtime on a /tmp copy, so token churn
  forces evict+rebuild storms mid-flight — the pre-lock list-then-pop
  eviction KeyErrors here.
- **C (mixed-corpus SQL API):** ``grouping_sets_revenue`` (temp-view
  based) alternates corpora concurrently; each result must hash-equal
  its OWN corpus's reference — cross-talk through the session-global
  view names is the failure mode (register+analyze are atomic via
  ``sources.tables.sql_over_views``).
- **D (mixed workload):** a LIVE rate-source streaming aggregate
  (update-mode memory sink, 1 s trigger) runs on the session while ten
  representative batch queries execute concurrently; batch answers
  must stay oracle-exact and the stream must stay active,
  exception-free, and processing rows throughout.

Run: ``python tools/concurrency_audit.py [--sf-dir A --sf-dir-b B]``.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

THREADS = 8


def result_hash(sdf) -> str:
    """Driver-canonical result hash — the shared definition in
    ``tests.oracle_harness.spark_result_hash`` (one definition for all
    cross-run audits)."""
    from tests.oracle_harness import spark_result_hash

    return spark_result_hash(sdf)


def persisted_rdd_count(spark) -> int:
    return int(spark.sparkContext._jsc.sc().getPersistentRDDs().size())


def leg_a(spark, sf_dir: str, report: dict) -> None:
    from realtime_voting_data_engineering_spark import queries as Q
    from tests.oracle_harness import compare_query

    names = sorted(n for n, s in Q.REGISTRY.items() if s.oracle is not None)

    def one(name: str) -> tuple[str, dict]:
        spec = Q.REGISTRY[name]
        try:
            compare_query(spark, name, spec.fn, spec.oracle, sf_dir)
            return name, {"status": "match"}
        except AssertionError as exc:
            return name, {"status": "mismatch", "detail": str(exc)[:500]}
        except Exception as exc:  # noqa: BLE001 — audit must survive any query
            return name, {
                "status": "error",
                "detail": f"{type(exc).__name__}: {str(exc)[:300]}",
            }

    for rnd in (1, 2):
        order = names[:]
        random.Random(rnd).shuffle(order)
        with ThreadPoolExecutor(max_workers=THREADS) as pool:
            for name, entry in pool.map(one, order):
                key = f"{name}@r{rnd}"
                report[key] = entry
                print(
                    json.dumps({"query": key, "status": entry["status"]}),
                    flush=True,
                )


def leg_b(spark, sf_a: str, sf_b: str, report: dict) -> None:
    from realtime_voting_data_engineering_spark import queries as Q
    from realtime_voting_data_engineering_spark.queries_pipeline import (
        _BM25_MEMO,
    )

    fn = Q.REGISTRY["bm25_search_topk"].fn
    ref = {sf: result_hash(fn(spark, sf)) for sf in (sf_a, sf_b)}
    # Reset so the stress exercises concurrent FIRST builds too — the
    # double-build insert race only exists on a cold memo.
    for k in list(_BM25_MEMO):
        try:
            _BM25_MEMO.pop(k)[1].unpersist()
        except Exception:  # noqa: BLE001
            pass
    base_persisted = persisted_rdd_count(spark)

    def hammer(tid: int) -> list[str]:
        errs = []
        for i in range(6):
            sf = (sf_a, sf_b)[(tid + i) % 2]
            h = result_hash(fn(spark, sf))
            if h != ref[sf]:
                errs.append(f"t{tid}i{i} {sf}: {h} != {ref[sf]}")
        return errs

    with ThreadPoolExecutor(max_workers=THREADS) as pool:
        errs = [e for es in pool.map(hammer, range(THREADS)) for e in es]
    entries = sum(1 for k in _BM25_MEMO if k[0] is spark)
    leaked = persisted_rdd_count(spark) - base_persisted - 2
    # The surviving index projections must still BE cached: a race-loss
    # path that unpersisted its "duplicate" build would — via
    # CacheManager plan-dedupe — have evicted the winner's shared entry.
    uncached = [
        k[1]
        for k, v in _BM25_MEMO.items()
        if k[0] is spark
        and not (v[1].storageLevel.useMemory or v[1].storageLevel.useDisk)
    ]
    status = (
        "match"
        if not errs and entries == 2 and leaked <= 0 and not uncached
        else "fail"
    )
    report["bm25_memo_stress"] = {
        "status": status,
        "detail": f"wrong_hashes={errs[:3]} memo_entries={entries} "
        f"leaked_persisted={leaked} uncached={uncached}",
    }
    print(json.dumps({"query": "bm25_memo_stress", "status": status}), flush=True)


def leg_b2(spark, sf_a: str, report: dict) -> None:
    """Eviction-race stress: hammer the memo while a mutator thread
    rewrites the corpus mtime (token changes force evict+rebuild storms
    on a /tmp copy). The pre-lock list-then-pop eviction could KeyError
    or hit "dict changed size during iteration" here; results must also
    stay correct throughout (content never changes, only the token)."""
    import shutil
    import time as _t

    from realtime_voting_data_engineering_spark import queries as Q

    work = "/tmp/rtv_conc_corpus"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    for f in os.listdir(sf_a):
        if f.endswith(".parquet"):
            shutil.copy2(os.path.join(sf_a, f), os.path.join(work, f))
    fn = Q.REGISTRY["bm25_search_topk"].fn
    ref = result_hash(fn(spark, work))
    stop = {"flag": False}

    def mutate() -> list[str]:
        doc = os.path.join(work, "documents.parquet")
        while not stop["flag"]:
            os.utime(doc)  # new mtime ⇒ new token ⇒ eviction + rebuild
            _t.sleep(0.05)
        return []

    def hammer(tid: int) -> list[str]:
        errs = []
        for i in range(8):
            try:
                h = result_hash(fn(spark, work))
                if h != ref:
                    errs.append(f"t{tid}i{i}: {h} != {ref}")
            except Exception as exc:  # noqa: BLE001 — the race WAS the bug
                errs.append(f"t{tid}i{i}: {type(exc).__name__}: {str(exc)[:120]}")
        return errs

    with ThreadPoolExecutor(max_workers=THREADS + 1) as pool:
        mut = pool.submit(mutate)
        errs = [e for es in pool.map(hammer, range(THREADS)) for e in es]
        stop["flag"] = True
        mut.result()
    status = "match" if not errs else "fail"
    report["bm25_memo_eviction_race"] = {"status": status, "detail": "; ".join(errs[:4])}
    print(
        json.dumps({"query": "bm25_memo_eviction_race", "status": status}),
        flush=True,
    )


def leg_c(spark, sf_a: str, sf_b: str, report: dict) -> None:
    from realtime_voting_data_engineering_spark import queries as Q

    fn = Q.REGISTRY["grouping_sets_revenue"].fn
    ref = {sf: result_hash(fn(spark, sf)) for sf in (sf_a, sf_b)}

    def hammer(tid: int) -> list[str]:
        errs = []
        for i in range(6):
            sf = (sf_a, sf_b)[(tid + i) % 2]
            h = result_hash(fn(spark, sf))
            if h != ref[sf]:
                errs.append(f"t{tid}i{i} {sf}: cross-talk ({h} != {ref[sf]})")
        return errs

    with ThreadPoolExecutor(max_workers=THREADS) as pool:
        errs = [e for es in pool.map(hammer, range(THREADS)) for e in es]
    status = "match" if not errs else "fail"
    report["sql_view_mixed_corpus"] = {
        "status": status,
        "detail": "; ".join(errs[:3]),
    }
    print(
        json.dumps({"query": "sql_view_mixed_corpus", "status": status}),
        flush=True,
    )


def leg_d(spark, sf_a: str, report: dict) -> None:
    """Mixed workload: a LIVE streaming aggregate (rate source →
    watermark → update-mode memory sink, 1 s processing trigger) runs
    on the session while batch queries execute concurrently. The
    serving tier's steady state is exactly this mix; batch answers must
    stay oracle-exact and the stream must stay healthy (active, no
    exception, progress observed) throughout."""
    import tempfile
    import time as _t

    from pyspark.sql import functions as F

    from realtime_voting_data_engineering_spark import queries as Q
    from realtime_voting_data_engineering_spark.sources.rate import (
        vote_rate_stream,
    )
    from realtime_voting_data_engineering_spark.streaming import pipeline as P
    from tests.oracle_harness import compare_query

    names = [
        "q1_pricing_summary",
        "q5_revenue_by_nation",
        "asof_last_click",
        "votes_per_candidate",
        "bm25_search_topk",
        "knn_pq_adc",
        "minhash_lsh_dedup",
        "event_rollup_multires",
        "doc_fingerprint_clusters",
        "grouping_sets_revenue",
    ]
    ckpt = tempfile.mkdtemp(prefix="rtv_conc_stream_")
    stream = vote_rate_stream(spark, rows_per_second=500)
    agg = (
        stream.withWatermark("voting_time", "1 minute")
        .groupBy("candidate_id")
        .agg(F.sum("vote").alias("total_votes"))
    )
    q = P.start_update_aggregate(
        agg,
        "conc_audit_stream",
        ckpt,
        trigger_available_now=False,
        processing_time="1 second",
    )
    errs: list[str] = []
    try:
        _t.sleep(2)  # let the first micro-batches land

        def one(name: str) -> str | None:
            spec = Q.REGISTRY[name]
            try:
                compare_query(spark, name, spec.fn, spec.oracle, sf_a)
                return None
            except Exception as exc:  # noqa: BLE001
                return f"{name}: {type(exc).__name__}: {str(exc)[:200]}"

        with ThreadPoolExecutor(max_workers=4) as pool:
            errs = [e for e in pool.map(one, names) if e]
        if not q.isActive or q.exception() is not None:
            errs.append(f"stream unhealthy: active={q.isActive} exc={q.exception()}")

        def rows_seen() -> int:
            return sum(
                p.get("numInputRows", 0) for p in (q.recentProgress or [])
            )

        if rows_seen() == 0:
            # One more beat — the first non-empty micro-batch may not
            # have reported yet.
            _t.sleep(2)
        if rows_seen() == 0:
            # "Progressing" means ROWS processed, not just committed
            # empty batches — a stalled rate source must fail the leg.
            errs.append("stream processed zero input rows during the mix")
    finally:
        q.stop()
    status = "match" if not errs else "fail"
    report["mixed_stream_batch"] = {"status": status, "detail": "; ".join(errs[:4])}
    print(
        json.dumps({"query": "mixed_stream_batch", "status": status}), flush=True
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--sf-dir-b", default="/root/testdata/sf0.01")
    ap.add_argument("--skip-leg-a", action="store_true")
    args = ap.parse_args()

    from realtime_voting_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="concurrency-audit")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    if not args.skip_leg_a:
        leg_a(spark, args.sf_dir, report)
    leg_b(spark, args.sf_dir, args.sf_dir_b, report)
    leg_b2(spark, args.sf_dir, report)
    leg_c(spark, args.sf_dir, args.sf_dir_b, report)
    leg_d(spark, args.sf_dir, report)

    bad = {k: v for k, v in report.items() if v["status"] != "match"}
    print(f"\n# {len(report)} checks, {len(report) - len(bad)} match, {len(bad)} flagged")
    for k, v in sorted(bad.items()):
        print(f"--- {k}: {v['status']}\n{v.get('detail', '')[:400]}\n")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
