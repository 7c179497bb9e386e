"""Executed-plan multi-scan sweep: flag registered queries that scan
the same table more than once at runtime (r9).

Method (learned the hard way this round): count "<table>.parquet" in
``executedPlan`` AFTER an action, and only in the text BEFORE
"== Initial Plan ==" — an executed AQE plan prints both the final and
the initial plan (double-counting every scan), and ReuseExchange only
materializes at runtime, so pre-action plans overstate scans (the r8
rollup cascade shows events ×3 before execution and ×1 after).

KNOWN BLIND SPOT — checkpoints: scans INSIDE a ``localCheckpoint``ed
subtree never appear in the final executed plan (the checkpoint shows
as a LogicalRDD), so this gate cannot see an upstream-of-checkpoint
recomputation. Compensations: EXACT entries below (allowed == required)
flag the checkpoint's REMOVAL (the count would jump), and the
checkpointed queries' own docstrings pin the intended shape; an
upstream doubling inside the checkpoint remains reviewable only by
reading the query code. Do not "fix" a flagged query by checkpointing
to hide the scan from this tool — materialization must earn its disk
(small intermediate, multiple consumers), per the jaccard_for_pairs
pattern.

A multi-scan is not automatically a bug: two DIFFERENT pushed-down
slices of one table (funnel event-type legs, a 10-row query-side kNN
scan next to the corpus scan, a broadcast dim read twice) are fine by
design. The EXPECTED map below is the triaged allowlist from the r9
sweep — each entry carries its justification. The tool exits non-zero
when a query exceeds its allowance, so an accidental recomputation
(the class that had q17/q18/q11 scanning lineitem twice, the
contamination scan tokenizing documents 3×, and the gap fill
aggregating events twice) fails loudly instead of compounding for
four rounds before a verdict flags the drift.

Run: ``python tools/scan_audit.py [--sf-dir ...] [--only a,b]``
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "lineitem",
    "orders",
    "customer",
    "supplier",
    "part",
    "nation",
    "region",
    "events",
    "documents",
    "embeddings",
)

#: (query, table) -> max allowed scans in the FINAL executed plan, with
#: the triage rationale. Anything not listed is allowed exactly 1 scan
#: per table.
EXPECTED: dict[tuple[str, str], tuple[int, str]] = {
    # Two different event-type slices, filters pushed to the scan —
    # each leg reads a fraction of the table.
    ("asof_last_click", "events"): (2, "clicks + purchases slices, pushed filters"),
    ("purchases_after_error", "events"): (2, "error + purchase slices, pushed filters"),
    ("purchase_and_error_users", "events"): (2, "two event-type slices (intersect)"),
    ("weekly_retention_cohorts", "events"): (2, "signup cohort + activity slices"),
    ("data_quality_report", "orders"): (2, "two independent rule scans, pruned columns"),
    # Query side = pushed ~10-row scan next to the one corpus scan.
    ("knn_cosine_topk", "embeddings"): (2, "pushed query-side scan + corpus scan"),
    ("knn_ann_srp", "embeddings"): (2, "pushed query-side scan + corpus scan"),
    ("embedding_near_dup_pairs", "embeddings"): (2, "band build + verify legs"),
    ("embedding_near_dup_srp", "embeddings"): (3, "bands + candidates + verify (1 reuse)"),
    # The stored-index side is simulated from the same table by design.
    ("incremental_new_docs", "documents"): (2, "corpus + simulated stored index"),
    ("winnow_overlap_topk", "documents"): (2, "index branches, checkpoint carries the rest"),
    # Tiny broadcast dims — a second copy is free.
    ("q7_nation_volume", "nation"): (2, "broadcast dim, both join sides"),
    ("q8_market_share", "nation"): (2, "broadcast dim, both join sides"),
    # Tried-and-rejected single-pass (Expand ×3 blowup) — two lean
    # co-partitioned passes are the chosen shape (docstring).
    ("q21_sole_late_supplier", "lineitem"): (2, "rejected collect_set fold, see docstring"),
    ("q21_sole_late_supplier", "orders"): (2, "rejected collect_set fold, see docstring"),
}

#: (query, table) -> EXACT required scan count in the final plan.
#: For checkpointed queries a LOWER-than-usual count is load-bearing
#: (the raw scan lives inside the checkpoint); a different count in
#: EITHER direction means the materialization contract changed.
EXACT: dict[tuple[str, str], tuple[int, str]] = {
    ("hourly_gap_filled", "events"): (0, "raw scan lives inside the hourly-agg checkpoint"),
    ("benchmark_contamination", "documents"): (1, "train side only; bench postings checkpointed"),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from realtime_voting_data_engineering_spark import queries as Q
    from realtime_voting_data_engineering_spark.session import get_spark

    if only is not None:
        # A stale/typo'd name must fail loudly, not silently narrow the
        # sweep to a vacuous green (r9 review finding).
        unknown = only - Q.REGISTRY.keys()
        if unknown:
            ap.error(f"unknown query names: {sorted(unknown)}")

    spark = get_spark(app_name="scan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    flagged: dict[str, str] = {}
    audited = 0
    for name in sorted(Q.REGISTRY):
        if only is not None and name not in only:
            continue
        audited += 1
        try:
            df = Q.REGISTRY[name].fn(spark, args.sf_dir)
            df.collect()
            final = (
                df._jdf.queryExecution().executedPlan().toString()
            ).split("== Initial Plan ==")[0]
        except Exception as exc:  # noqa: BLE001 — sweep must survive any query
            flagged[name] = f"error: {type(exc).__name__}: {str(exc)[:200]}"
            continue
        over = {}
        for t in TABLES:
            n = final.count(f"{t}.parquet")
            if (name, t) in EXACT:
                required = EXACT[(name, t)][0]
                if n != required:
                    over[t] = (n, required)
                continue
            allowed = EXPECTED.get((name, t), (1, ""))[0]
            if n > allowed:
                over[t] = (n, allowed)
        if over:
            flagged[name] = ", ".join(
                f"{t}: {n} scans (allowed {a})" for t, (n, a) in over.items()
            )
            print(f'{{"query": "{name}", "status": "multi-scan", '
                  f'"detail": "{flagged[name]}"}}', flush=True)
    print(f"\n# {audited} audited, {audited - len(flagged)} match, "
          f"{len(flagged)} flagged")
    for n, d in sorted(flagged.items()):
        print(f"--- {n}: {d}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
