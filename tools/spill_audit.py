"""Memory-pressure (spill) audit: operator-vs-oracle agreement when the
working set EXCEEDS executor memory and Tungsten must spill — the tenth
adversary class after NULLs, non-finite floats, row order, extreme
values, degenerate layouts, composed fuzz, host timezones, concurrency,
and task retries.

Partitions that fit comfortably in memory on a laptop-scale test corpus
are exactly the thing a 100 TB deployment never sees: at scale every
sort, hash aggregate, and shuffle join runs against a fixed per-task
memory budget and SPILLS the overflow to disk. Correctness then depends
on code paths a small local run never executes — external sort merge,
spill-file readback in aggregation, build-side spilling — and on every
operator's semantics being insensitive to the extra merge passes
(ordering, tie-breaks, accumulation order). This repo's determinism
contracts (fixed-association-order double arithmetic, total-order
top-k) claim exactly that insensitivity; this audit makes it empirical.

Mechanism (subprocess, because the JVM heap is launch-fixed): the
parent replicates the heavy sf0.1 tables VERBATIM ``--replicate``×
(duplicate rows change answers, but the DuckDB oracle reads the same
replicated files, and the duplicate-row audits already certify operator
totality), then a worker launched with a capped ``--driver-memory`` (local
mode: the driver IS the executor, so this caps Tungsten execution
memory; 900m in the certified config) runs the shuffle/sort/window/join-heavy query subset against
the oracles. Anti-vacuity gates, per the suite's standard: the worker
asserts the heap cap actually took (``Runtime.maxMemory`` < the cap)
and, after the sweep, that the stage metrics report NON-ZERO disk
bytes spilled (read from the local UI REST API) — a run that never
spilled is a clean re-run, not a memory-pressure audit.

Run: ``python tools/spill_audit.py`` (defaults: 16x sf0.1, 900m heap,
spark.memory.fraction=0.15 — the certified configuration; 151 MB
spilled, 18/18 match).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Default corpus location PREFIX — replicate() mints a fresh
#: per-invocation directory under it so concurrent runs (the pytest pin
#: plus a manual sweep) can't rmtree each other's live corpus.
WORKDIR_PREFIX = "rtv_spill_audit_"

#: The shuffle/sort/window/join-heavy subset — queries whose physical
#: plans contain the operators that own spill files (external sort,
#: hash-aggregate fallback, shuffle join build sides, window buffers),
#: plus the Arrow-kernel and index paths to prove the Python boundary
#: survives memory pressure too.
HEAVY_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q18_large_orders",
    "top_orders_per_priority",
    "asof_last_click",
    "purchases_after_error",
    "user_sessions",
    "weekly_retention_cohorts",
    "cdc_latest_state",
    "event_rollup_multires",
    "activation_funnel",
    "minhash_lsh_dedup",
    "near_dup_clusters",
    "doc_fingerprint_clusters",
    "bm25_search_topk",
    "text_profile",
    "knn_pq_adc",
]

#: Tables worth replicating — the big/fact side of every heavy query.
REPLICATED = {"lineitem", "orders", "events", "documents", "embeddings"}


def replicate(sf_dir: str, k: int) -> str:
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    workdir = tempfile.mkdtemp(prefix=WORKDIR_PREFIX)
    for fname in os.listdir(sf_dir):
        if not fname.endswith(".parquet"):
            continue
        tname = fname[: -len(".parquet")]
        tbl = pq.read_table(os.path.join(sf_dir, fname))
        if tname in REPLICATED and k > 1:
            tbl = pa.concat_tables([tbl] * k)
        # Default row-group sizing (NOT one giant group): multiple row
        # groups → parallel scan tasks → genuine concurrent memory
        # pressure, the shape a real cluster always has.
        pq.write_table(tbl, os.path.join(workdir, fname))
    return workdir


def _total_disk_spilled(spark) -> int:
    """Sum diskBytesSpilled over all stages via the local UI REST API —
    the only stable spill counter reachable from PySpark."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return -1
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        apps = json.load(r)
    app_id = apps[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return sum(s.get("diskBytesSpilled", 0) for s in stages)


def _parse_heap(heap: str) -> int:
    """Bytes for a JVM-style heap spec (``900m``, ``1.5g``, case-
    insensitive). Rejects unitless specs up front — a bare number means
    BYTES to --driver-memory, which would silently undercut the cap the
    assert compares against."""
    m = heap.strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    if not m or m[-1] not in units:
        raise ValueError(f"--heap must end in k/m/g, got {heap!r}")
    return int(float(m[:-1]) * units[m[-1]])


def worker(
    corpus: str, heap: str, report_path: str, mem_fraction: str,
    only: list[str] | None = None,
) -> None:
    from realtime_voting_data_engineering_spark import queries as Q
    from realtime_voting_data_engineering_spark.session import get_spark
    from tests.oracle_harness import compare_query

    # local[8], not local[32]: 8 concurrent tasks against a sub-1g heap
    # is sustained pressure that spills; 32 would tip into OOM noise.
    # Shrinking spark.memory.fraction squeezes the MANAGED (spillable)
    # pool specifically, driving more external-sort/agg spill passes
    # while leaving unmanaged headroom (broadcast buffers, codegen)
    # alone — the 16x/500m probe showed unmanaged allocation is what
    # OOMs first, and that failure is LOUD, never silent wrongness.
    spark = get_spark(
        app_name="spill-audit",
        master="local[8]",
        extra_conf={"spark.memory.fraction": mem_fraction},
    )
    spark.sparkContext.setLogLevel("ERROR")

    jvm_max = int(
        spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
    )
    cap_bytes = _parse_heap(heap)
    # Runtime.maxMemory() is always BELOW -Xmx (survivor-space slack),
    # so no tolerance factor: a slack multiplier wide enough to admit
    # Spark's default 1g driver heap would let a silently-dropped
    # PYSPARK_SUBMIT_ARGS turn this into a full-memory re-run.
    assert jvm_max <= cap_bytes, (
        f"JVM max heap {jvm_max/1e6:.0f} MB exceeds the --driver-memory "
        f"cap ({heap}) — the cap did not take; this would be a "
        "full-memory re-run"
    )

    report: dict[str, dict] = {}
    for name in HEAVY_QUERIES:
        if only and name not in only:
            continue
        spec = Q.REGISTRY[name]
        try:
            compare_query(spark, name, spec.fn, spec.oracle, corpus)
            report[name] = {"status": "match"}
        except AssertionError as exc:
            report[name] = {"status": "mismatch", "detail": str(exc)[:500]}
        except Exception as exc:  # noqa: BLE001 — audit must survive any query
            report[name] = {
                "status": "error",
                "detail": f"{type(exc).__name__}: {str(exc)[:300]}",
            }
        print(
            json.dumps({"query": name, "status": report[name]["status"]}),
            flush=True,
        )
    spilled = _total_disk_spilled(spark)
    report["_env"] = {
        "jvm_max_heap_mb": round(jvm_max / 1e6),
        "disk_bytes_spilled": spilled,
    }
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=16)
    ap.add_argument("--heap", default="900m")
    ap.add_argument("--memory-fraction", default="0.15")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--corpus", default=None, help="worker-only: corpus dir")
    ap.add_argument("--report", default="/tmp/rtv_spill_audit.json")
    args = ap.parse_args()

    if args.worker:
        if not args.corpus:
            ap.error("--worker requires --corpus (the parent mints a "
                     "fresh replicated dir per invocation)")
        worker(
            args.corpus, args.heap, args.report, args.memory_fraction,
            args.only.split(",") if args.only else None,
        )
        return 0

    corpus = replicate(args.sf_dir, args.replicate)
    env = dict(
        os.environ,
        PYSPARK_SUBMIT_ARGS=f"--driver-memory {args.heap} pyspark-shell",
        SPARK_GRAFT_UI="true",  # the spill counters come from the UI API
    )
    try:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--corpus", corpus, "--heap", args.heap,
             "--report", args.report,
             "--memory-fraction", args.memory_fraction]
            + (["--only", args.only] if args.only else []),
            env=env,
            check=True,
        )
        with open(args.report) as f:
            rep = json.load(f)
    finally:
        # ALWAYS reclaim the multi-GB replicated corpus — worker
        # failures (the documented OOM-boundary probes exit non-zero)
        # must not accumulate rtv_spill_audit_* dirs until /tmp fills.
        shutil.rmtree(corpus, ignore_errors=True)
    envr = rep.pop("_env", {})
    bad = {n: r for n, r in rep.items() if r["status"] != "match"}
    spilled = envr.get("disk_bytes_spilled", 0)
    print(
        f"\n# {len(rep)} audited at {args.replicate}x sf0.1 under a "
        f"{envr.get('jvm_max_heap_mb')} MB heap, "
        f"{spilled/1e6:.0f} MB spilled to disk, "
        f"{len(rep) - len(bad)} match, {len(bad)} flagged"
    )
    for n, r in sorted(bad.items()):
        print(f"--- {n}: {r['status']}\n{r.get('detail', '')[:400]}\n")
    if spilled < 0:
        print("--- ANTI-VACUITY FAILURE: spill counters unavailable — "
              "the worker ran without the UI REST API (SPARK_GRAFT_UI)")
        return 1
    if spilled == 0:
        print("--- ANTI-VACUITY FAILURE: no disk spill was recorded — "
              "raise --replicate or lower --heap")
        return 1
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
