"""Host-timezone audit: operator-vs-oracle agreement and result
invariance when the PROCESS timezone is adversarial — the seventh
adversary class after NULLs (``null_audit``), non-finite floats
(``float_audit``), row order (``order_audit``), extreme values
(``extreme_audit``), degenerate file layouts (``split_audit``) and
composed fuzz (``fuzz_audit``).

At 100 TB the engine does not get to choose where it runs: driver and
executors may sit in machines whose host timezone is anything, and a
correctness harness that silently assumes UTC hosts reports false
mismatches (or worse, false matches) the day it runs in ap-southeast.
The engine pins ``spark.sql.session.timeZone=UTC`` at the session
boundary (``session.py`` / ``sources.tables.ensure_session_confs``) so
SQL-level timestamp semantics are host-independent; this audit proves
the pin actually reaches every query END TO END — including the
collect/canonicalize path, where PySpark's row-based ``collect()``
renders TIMESTAMP values through the process-local timezone (the leak
that motivated the Arrow-based collection in ``tests.oracle_harness``).

Two legs, both in subprocesses because a JVM's default timezone is
fixed at launch:

- **Leg A (engine vs oracle, adversarial host):** the full oracled
  registry runs under ``TZ=Pacific/Chatham`` (+12:45/+13:45, DST, a
  non-whole-hour offset — maximally adversarial) and every query must
  still match its DuckDB oracle, whose own connection inherits the
  same host timezone.
- **Leg B (cross-host invariance):** the timestamp/date-consuming
  queries re-run under ``TZ=America/New_York`` and their canonical
  Spark result hashes must be byte-identical to leg A's — the result
  is a pure function of the data, not of where the cluster happens to
  be deployed.

Run: ``python tools/tz_audit.py [--sf-dir ...]`` (parent mode; spawns
the workers). A worker asserts its JVM default timezone actually IS the
adversarial one before auditing anything — a silently-ignored TZ env
var would reduce the audit to a UTC re-run (the ``order_audit``
sanity-check lesson).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Queries whose results involve timestamps or dates anywhere in the
#: plan — the cross-timezone invariance set for leg B. Superset source:
#: tests/test_registry_order.py's ts-consumer pin, plus the DATE-typed
#: TPC-H/date-part queries (DATE is tz-free in both engines, but the
#: audit asserts that rather than assuming it).
TIME_QUERIES = [
    "activation_funnel",
    "asof_last_click",
    "cdc_latest_state",
    "daily_activity_reconciliation",
    "event_rollup_multires",
    "event_window_suite",
    "hourly_gap_filled",
    "hourly_vote_counts",
    "latest_vote_per_user",
    "purchase_with_prior_view",
    "purchases_after_error",
    "user_sessions",
    "weekly_retention_cohorts",
    "order_date_parts",
    "q1_pricing_summary",
    "q3_shipping_priority",
]


def _spark_result_hash(sdf) -> str:
    """Driver-canonical result hash — the shared definition in
    ``tests.oracle_harness.spark_result_hash`` (one definition for all
    cross-run audits, so the tz and concurrency tools can never hash
    different bytes)."""
    from tests.oracle_harness import spark_result_hash

    return spark_result_hash(sdf)


def worker(sf_dir: str, only: list[str] | None, report_path: str) -> None:
    """Run inside ``TZ=<adversarial>``: full engine-vs-oracle sweep plus
    canonical Spark hashes for the time-consuming queries."""
    want_tz = os.environ.get("TZ")
    assert want_tz, "worker must be launched with TZ set"
    time.tzset()

    from realtime_voting_data_engineering_spark import queries as Q
    from realtime_voting_data_engineering_spark.session import get_spark
    from tests.oracle_harness import compare_query

    spark = get_spark(app_name="tz-audit")
    spark.sparkContext.setLogLevel("ERROR")
    jvm_tz = spark.sparkContext._jvm.java.util.TimeZone.getDefault().getID()
    # Sanity: the adversary must be real on every layer we control.
    assert jvm_tz == want_tz, (
        f"JVM default timezone is {jvm_tz!r}, wanted {want_tz!r} — the "
        "audit would silently degrade to a UTC re-run"
    )
    assert time.strftime("%z") not in ("+0000", "Z", ""), (
        "python process timezone still UTC — TZ env var did not take"
    )
    import duckdb

    duck_tz = duckdb.connect().execute(
        "SELECT current_setting('TimeZone')"
    ).fetchone()[0]

    # Detection-power proof (the _sanity_check_poison analogue): under
    # this adversarial tz, the harness's PRE-fix collection path
    # (row-based collect(), process-local fromtimestamp rendering) must
    # canonicalize a known instant DIFFERENTLY from the Arrow path the
    # harness now uses. If the two agree, the host tz never reached the
    # collect layer and the whole audit is a UTC re-run in disguise.
    from tests.oracle_harness import _canon

    probe = spark.sql("SELECT TIMESTAMP '2024-03-01 12:30:45.123456' AS ts")
    via_row = _canon(probe.collect()[0][0])
    via_arrow = _canon(probe.toArrow().column(0).to_pylist()[0])
    assert via_arrow == "2024-03-01 12:30:45.123456", via_arrow
    assert via_row != via_arrow, (
        f"row-collect and Arrow canon agree ({via_row!r}) under "
        f"TZ={want_tz} — the adversary has no teeth on this host"
    )

    report: dict[str, dict] = {
        "_env": {
            "tz": want_tz,
            "jvm_tz": jvm_tz,
            "duckdb_tz": duck_tz,
            "row_vs_arrow_probe": [via_row, via_arrow],
        }
    }
    for name, spec in sorted(Q.REGISTRY.items()):
        if spec.oracle is None or (only and name not in only):
            continue
        entry: dict = {}
        try:
            compare_query(spark, name, spec.fn, spec.oracle, sf_dir)
            entry["status"] = "match"
        except AssertionError as exc:
            entry["status"] = "mismatch"
            entry["detail"] = str(exc)[:500]
        except Exception as exc:  # noqa: BLE001 — audit must survive any query
            entry["status"] = "error"
            entry["detail"] = f"{type(exc).__name__}: {str(exc)[:300]}"
        if name in TIME_QUERIES:
            try:
                entry["spark_hash"] = _spark_result_hash(spec.fn(spark, sf_dir))
            except Exception as exc:  # noqa: BLE001
                entry["spark_hash"] = f"error:{type(exc).__name__}"
        report[name] = entry
        print(
            json.dumps({"query": name, "status": entry["status"]}), flush=True
        )
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1)


def _run_worker(tz: str, sf_dir: str, only: list[str] | None, report: str) -> dict:
    env = dict(os.environ, TZ=tz)
    cmd = [sys.executable, os.path.abspath(__file__), "--worker",
           "--sf-dir", sf_dir, "--report", report]
    if only:
        cmd += ["--only", ",".join(only)]
    print(f"## worker TZ={tz} only={len(only) if only else 'ALL'}", flush=True)
    subprocess.run(cmd, env=env, check=True)
    with open(report) as f:
        return json.load(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--only", default=None)
    ap.add_argument("--report", default="/tmp/rtv_tz_audit_report.json")
    ap.add_argument("--tz-a", default="Pacific/Chatham")
    ap.add_argument("--tz-b", default="America/New_York")
    args = ap.parse_args()

    if args.worker:
        only = args.only.split(",") if args.only else None
        worker(args.sf_dir, only, args.report)
        return 0

    # Leg reports derive from --report so a custom path is honored and
    # two simultaneous invocations can't clobber each other's files.
    # --only narrows BOTH legs (tools/run_audits.py --quick relies on
    # this; pre-r9 the orchestrator silently ignored it and ran full).
    only = args.only.split(",") if args.only else None
    time_queries = [
        n for n in TIME_QUERIES if only is None or n in only
    ]
    rep_a = _run_worker(
        args.tz_a, args.sf_dir, only, args.report + ".a"
    )
    # An empty narrowed set must SKIP leg B: _run_worker omits --only
    # for a falsy list, which would silently run the full registry.
    rep_b = (
        _run_worker(args.tz_b, args.sf_dir, time_queries, args.report + ".b")
        if time_queries
        else {}
    )

    flagged: dict[str, str] = {}
    audited = 0
    for name, entry in rep_a.items():
        if name.startswith("_"):
            continue
        audited += 1
        if entry["status"] != "match":
            flagged[name] = f"[{args.tz_a}] {entry['status']}: " + entry.get(
                "detail", ""
            )[:300]
    for name in time_queries:
        b = rep_b.get(name)
        if b is None:
            flagged.setdefault(name, "missing from leg B report")
            continue
        if b["status"] != "match":
            flagged.setdefault(
                name,
                f"[{args.tz_b}] {b['status']}: " + b.get("detail", "")[:300],
            )
        ha, hb = rep_a.get(name, {}).get("spark_hash"), b.get("spark_hash")
        # A missing hash or an error sentinel is NOT invariance even
        # when both legs agree on it — two same-typed failures would
        # otherwise certify a hash that was never computed.
        if (
            not ha
            or not hb
            or str(ha).startswith("error:")
            or str(hb).startswith("error:")
        ):
            flagged.setdefault(
                name, f"no comparable hash: {args.tz_a}={ha} {args.tz_b}={hb}"
            )
        elif ha != hb:
            flagged.setdefault(
                name,
                f"cross-tz hash drift: {args.tz_a}={ha} {args.tz_b}={hb}",
            )
    print(
        f"\n# {audited} audited under {args.tz_a} "
        f"({rep_a.get('_env')}), {len(time_queries)} cross-checked vs "
        f"{args.tz_b} ({rep_b.get('_env')}), {len(flagged)} flagged"
    )
    for n, d in sorted(flagged.items()):
        print(f"--- {n}: {d}\n")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
