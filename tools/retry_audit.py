"""Task-retry fault-injection audit: operator-vs-oracle agreement when
EVERY task's first attempt fails and is retried — the ninth adversary
class after NULLs, non-finite floats, row order, extreme values,
degenerate layouts, composed fuzz, host timezones, and concurrency.

On a 1000-executor cluster task retries are not an edge case: executors
are preempted, spot nodes vanish, speculative execution races duplicate
attempts, and fetch failures replay whole map stages. Correctness then
rests on a property local runs never exercise: RECOMPUTATION must be
deterministic. A plan with a nondeterministic step (unseeded sampling,
first-wins tie-breaks over arbitrary partition order, a cached frame
whose branches could cache divergent rows) silently returns different
answers depending on which attempt survived. This repo's contracts say
that can't happen — every registered plan is a pure function of the row
set (the order audit proves set-purity; the lazy-localCheckpoint sites
document plan determinism as their precondition). This audit makes the
claim empirical.

Mechanism (subprocess, because the master string is launch-fixed):
``local[8,4]`` allows 4 attempts per task; the worker monkeypatches
``sources.tables.load_table`` — the single choke point every registered
query loads data through — to append an identity ``mapInPandas`` stage
whose kernel RAISES on ``TaskContext.attemptNumber() == 0`` and passes
batches through untouched on retry. Every scan-stage task of every
query therefore fails once and recomputes, including the eager
index-build jobs (BM25 stats, IVF assignment) that run during query
construction. Each kernel invocation drops a marker file; the worker
asserts afterwards that failures really were injected (hundreds of
markers) — the anti-vacuity gate every audit in this suite carries.

Run: ``python tools/retry_audit.py [--sf-dir ...] [--only a,b,c]``.
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

MARKER_DIR = "/tmp/rtv_retry_audit_markers"


def _with_fail_once(df, marker_dir: str):
    """Append an identity mapInPandas stage that fails each task's first
    attempt. Schema is preserved exactly; retried attempts stream the
    batches through untouched."""

    def kernel(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc is not None and tc.attemptNumber() == 0:
            # Marker BEFORE raising: proof the failure really fired.
            with open(
                os.path.join(
                    marker_dir,
                    f"s{tc.stageId()}_p{tc.partitionId()}",
                ),
                "w",
            ):
                pass
            raise RuntimeError("retry_audit: injected first-attempt failure")
        yield from batches

    return df.mapInPandas(kernel, schema=df.schema)


def worker(sf_dir: str, only: list[str] | None, report_path: str) -> None:
    # The worker owns marker-dir hygiene (not just the parent): stage
    # ids restart per session, so leftover s<id>_p<part> files from a
    # previous run would collide with this session's markers and make
    # the per-query delta gate false-flag correctly-injected queries as
    # 'uninjected' when --worker is invoked standalone.
    shutil.rmtree(MARKER_DIR, ignore_errors=True)
    os.makedirs(MARKER_DIR, exist_ok=True)

    # Patch the choke point BEFORE the queries modules import it: they
    # bind the name at import time (`from ...tables import load_table`).
    import realtime_voting_data_engineering_spark.sources.tables as T

    orig_load_table = T.load_table

    def failing_load_table(spark, sf_dir_, name):
        return _with_fail_once(
            orig_load_table(spark, sf_dir_, name), MARKER_DIR
        )

    T.load_table = failing_load_table

    from realtime_voting_data_engineering_spark import queries as Q
    from realtime_voting_data_engineering_spark.session import get_spark
    from tests.oracle_harness import compare_query

    # 4 attempts per task — first-attempt failures retry instead of
    # killing the job (plain local[N] has maxFailures=1).
    spark = get_spark(app_name="retry-audit", master="local[8,4]")
    # OFF, not ERROR: every injected first-attempt failure logs a full
    # executor stack trace that would drown the audit's own output.
    spark.sparkContext.setLogLevel("OFF")

    report: dict[str, dict] = {}
    for name, spec in sorted(Q.REGISTRY.items()):
        if spec.oracle is None or (only and name not in only):
            continue
        markers_before = len(os.listdir(MARKER_DIR))
        try:
            compare_query(spark, name, spec.fn, spec.oracle, sf_dir)
            report[name] = {"status": "match"}
        except AssertionError as exc:
            report[name] = {"status": "mismatch", "detail": str(exc)[:500]}
        except Exception as exc:  # noqa: BLE001 — audit must survive any query
            report[name] = {
                "status": "error",
                "detail": f"{type(exc).__name__}: {str(exc)[:300]}",
            }
        # PER-QUERY anti-vacuity (marker names are (stageId, partition),
        # and stage ids grow monotonically per session, so each query's
        # injected failures mint NEW files): a query that launched no
        # failing scan is a clean un-injected re-run — its data loading
        # bypassed the patched choke point — and must turn the audit
        # red, not ride on other queries' markers.
        if len(os.listdir(MARKER_DIR)) == markers_before and report[name][
            "status"
        ] == "match":
            report[name] = {
                "status": "uninjected",
                "detail": "no task failure fired during this query — "
                "its scans bypassed the patched load_table",
            }
        print(
            json.dumps({"query": name, "status": report[name]["status"]}),
            flush=True,
        )
    n_markers = len(os.listdir(MARKER_DIR))
    report["_env"] = {
        "master": "local[8,4]",
        "injected_failures": n_markers,
    }
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--only", default=None)
    ap.add_argument("--report", default="/tmp/rtv_retry_audit.json")
    args = ap.parse_args()

    if args.worker:
        worker(args.sf_dir, args.only.split(",") if args.only else None,
               args.report)
        return 0

    shutil.rmtree(MARKER_DIR, ignore_errors=True)
    cmd = [sys.executable, os.path.abspath(__file__), "--worker",
           "--sf-dir", args.sf_dir, "--report", args.report]
    if args.only:
        cmd += ["--only", args.only]
    subprocess.run(cmd, check=True)
    with open(args.report) as f:
        rep = json.load(f)
    env = rep.pop("_env", {})
    bad = {n: r for n, r in rep.items() if r["status"] != "match"}
    print(
        f"\n# {len(rep)} audited under {env.get('master')} with "
        f"{env.get('injected_failures')} injected task failures, "
        f"{len(rep) - len(bad)} match, {len(bad)} flagged"
    )
    for n, r in sorted(bad.items()):
        print(f"--- {n}: {r['status']}\n{r.get('detail', '')[:400]}\n")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
