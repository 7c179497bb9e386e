"""One entry point for the adversary-audit suite (r8 verdict #7).

Runs every audit class as a subprocess, parses each tool's own summary
line, and prints a per-class timing table — so "all audits green" is
one command and its cost is visible, instead of eleven ad-hoc
invocations at 1.5-6 min each.

Modes:
  python tools/run_audits.py            # full certification (~30-45 min)
  python tools/run_audits.py --quick    # smoke legs (~6-10 min): a
      representative cross-family query subset per class, one fuzz
      seed, concurrency without the 98x2 pool leg
  python tools/run_audits.py --classes tz,locale   # named classes only

Pass/fail per class = the subprocess exit code AND its summary line
reporting "0 flagged" (the per-query audits historically exit 0 even
when flagging — the summary line is the authoritative signal there).
Exit code: 0 iff every class passed.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))

#: Cross-family smoke subset for --quick: a streaming-parity aggregate,
#: a TPC-H join/agg, a mapInPandas kernel path (the fused PQ ADC), a
#: banded-join dedup, the memoized BM25 index, and the timestamp-heavy
#: rollup cascade — one representative per operator family the audits
#: stress differently.
QUICK_ONLY = (
    "votes_per_candidate,q1_pricing_summary,knn_pq_adc,"
    "minhash_lsh_dedup,bm25_search_topk,event_rollup_multires"
)

#: (class name, full-mode argv, quick-mode argv). argv excludes the
#: leading interpreter/script; None quick argv = same as full.
AUDITS: list[tuple[str, list[str], list[str] | None]] = [
    ("null", [], ["--only", QUICK_ONLY]),
    ("float", [], ["--only", QUICK_ONLY]),
    ("order", [], ["--only", QUICK_ONLY]),
    ("extreme", [], ["--only", QUICK_ONLY]),
    ("split", [], ["--only", QUICK_ONLY]),
    ("tz", [], ["--only", QUICK_ONLY]),
    ("locale", [], ["--only", QUICK_ONLY]),
    ("retry", [], ["--only", QUICK_ONLY]),
    ("concurrency", [], ["--skip-leg-a"]),
    # Spill stays at the certified 16x/900m/0.15 config in BOTH modes
    # (weaker configs can fail the non-zero-spill anti-vacuity gate);
    # quick just narrows to the heaviest four queries.
    (
        "spill",
        [],
        ["--only", "q18_large_orders,q1_pricing_summary,minhash_lsh_dedup,near_dup_clusters"],
    ),
    ("fuzz", ["--seeds", "1,2,3"], ["--seeds", "1", "--only", QUICK_ONLY]),
    # Plan-shape gate, not an oracle adversary: flags accidental
    # multi-scans of one table in the final executed plan (the class
    # that had q17/q18/q11 scanning lineitem twice for four rounds).
    # Quick leg uses a CLASS-SPECIFIC subset — the historical offenders
    # plus one allowlisted and one exact-count (checkpointed) query —
    # so the smoke actually exercises the allowance paths (QUICK_ONLY
    # contains only historically-clean default-allowance queries).
    (
        "scan",
        [],
        ["--only",
         "q17_small_qty_revenue,q18_large_orders,q11_value_share_analog,"
         "asof_last_click,hourly_gap_filled,benchmark_contamination"],
    ),
]

_FLAGGED_RE = re.compile(r"(\d+)\s+flagged")
_AUDITED_RE = re.compile(r"(\d+)\s+(?:audited|checks|cross-checked)")


def run_one(name: str, argv: list[str]) -> tuple[bool, float, str]:
    script = os.path.join(TOOLS_DIR, f"{name}_audit.py")
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, script, *argv],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(TOOLS_DIR),
    )
    elapsed = time.perf_counter() - t0
    # The authoritative signal is the tool's own summary: the LAST
    # "<n> flagged" occurrence in stdout (fuzz prints one per seed plus
    # an all-seeds total; the total comes last).
    flagged_counts = _FLAGGED_RE.findall(proc.stdout)
    summary_lines = [
        ln.strip()
        for ln in proc.stdout.splitlines()
        if _FLAGGED_RE.search(ln)
    ]
    summary = summary_lines[-1] if summary_lines else "(no summary line)"
    # Anti-vacuity: EVERY audited/checks/cross-checked count in the
    # summary must be non-zero — a renamed query or an
    # emptily-intersecting --only filter would otherwise certify green
    # having audited nothing, and the tz/locale summaries carry a
    # SECOND count (the cross-check leg) that can go vacuous on its own
    # (r9 review findings ×2). Consequence: the --quick subset must
    # always include at least one time-consuming and one string-heavy
    # query so those legs have work — QUICK_ONLY does.
    audited_counts = _AUDITED_RE.findall(summary)
    ok = (
        proc.returncode == 0
        and bool(flagged_counts)
        and flagged_counts[-1] == "0"
        and bool(audited_counts)
        and all(int(c) > 0 for c in audited_counts)
    )
    if not ok:
        sys.stderr.write(f"\n===== {name} audit output (failed) =====\n")
        sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-2000:] + "\n")
    return ok, elapsed, summary


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smoke legs only")
    ap.add_argument(
        "--classes",
        default=None,
        help="comma-separated subset of class names (default: all)",
    )
    args = ap.parse_args()
    wanted = set(args.classes.split(",")) if args.classes else None
    unknown = (wanted or set()) - {n for n, _, _ in AUDITS}
    if unknown:
        ap.error(f"unknown classes: {sorted(unknown)}")

    print(f"mode: {'quick' if args.quick else 'full'}   loadavg: "
          f"{tuple(round(x, 2) for x in os.getloadavg())}")
    results: list[tuple[str, bool, float, str]] = []
    for name, full_argv, quick_argv in AUDITS:
        if wanted is not None and name not in wanted:
            continue
        argv = (quick_argv if args.quick and quick_argv is not None else full_argv)
        print(f"-> {name} ...", flush=True)
        ok, elapsed, summary = run_one(name, argv)
        results.append((name, ok, elapsed, summary))
        print(f"   {'PASS' if ok else 'FAIL'} in {elapsed:6.1f}s — {summary}",
              flush=True)

    print(f"\n{'class':<14}{'status':<8}{'sec':>7}  summary")
    for name, ok, elapsed, summary in results:
        print(f"{name:<14}{'PASS' if ok else 'FAIL':<8}{elapsed:7.1f}  {summary}")
    total = sum(r[2] for r in results)
    n_fail = sum(1 for r in results if not r[1])
    print(f"\n# {len(results)} classes, {len(results) - n_fail} pass, "
          f"{n_fail} fail, {total:.0f}s total   loadavg: "
          f"{tuple(round(x, 2) for x in os.getloadavg())}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
