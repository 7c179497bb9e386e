"""Degenerate-file-layout audit: operator-vs-oracle agreement when
every table arrives as a multi-part directory containing EMPTY part
files, single-row parts, and micro row groups — the fifth adversary
class after NULLs, non-finite floats, row order, and extreme values.

At 100 TB the file layout is hostile by default: streaming sinks write
empty parts on idle triggers, compaction jobs leave 1-row remainders,
failed-and-retried writers leave schema-only files, and row-group sizes
vary per writer config. A query whose result (or survival) depends on
"every scan partition has rows" breaks in ways a clean single-file
corpus can never show:

- ``mapInPandas`` / ``applyInPandas`` kernels receive zero batches for
  empty partitions — per-batch code must not assume a first batch.
- Aggregations see partitions contributing no groups (partial-agg
  merge paths with empty sides).
- Scan planning sees files much smaller than ``maxPartitionBytes`` and
  files whose footer says 0 rows.

Layout written per table (rows are NOT mutated — same logical row set,
so the single-file oracle is the referee):

- ``part-000.parquet`` — 0 rows, schema only (idle streaming trigger)
- ``part-001.parquet`` — exactly 1 row (compaction remainder)
- ``part-002.parquet`` — 0 rows again (retried writer)
- ``part-003.parquet`` — next 7 rows, written with ``row_group_size=2``
  (micro row groups, one writer's bad config)
- ``part-004+.parquet`` — the remaining rows over 3 parts

Run: ``python tools/split_audit.py [--sf-dir ...] [--only a,b,c]``
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKDIR = "/tmp/rtv_split_audit"


def poison(sf_dir: str) -> str:
    """Rewrite every table as the degenerate multi-part layout above.
    Row content and order are untouched — only the file layout changes,
    so any divergence is a layout sensitivity, never a data edge."""
    os.makedirs(WORKDIR, exist_ok=True)
    out_dir = os.path.join(WORKDIR, os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for fname in sorted(os.listdir(sf_dir)):
        if not fname.endswith(".parquet"):
            continue
        tbl = pq.read_table(os.path.join(sf_dir, fname))
        part_dir = os.path.join(out_dir, fname)  # <name>.parquet/ dir
        os.makedirs(part_dir)

        def write(piece, idx: int, **kw) -> None:
            pq.write_table(
                piece, os.path.join(part_dir, f"part-{idx:03d}.parquet"), **kw
            )

        write(tbl.slice(0, 0), 0)                      # empty, schema only
        write(tbl.slice(0, 1), 1)                      # exactly 1 row
        write(tbl.slice(0, 0), 2)                      # empty again
        write(tbl.slice(1, 7), 3, row_group_size=2)    # micro row groups
        rest = tbl.slice(8)
        step = max(1, (len(rest) + 2) // 3)
        for p in range(3):
            chunk = rest.slice(p * step, step)
            write(chunk, 4 + p)                        # may be 0-row for tiny tables
    return out_dir


def _sanity_check_poison(sf_dir: str, out_dir: str) -> None:
    """The layout must actually be degenerate AND lossless — a silently
    single-part or row-dropping rewriter would reduce the audit to a
    plain re-run."""
    for tname in ("events", "documents", "nation"):
        src = pq.read_table(os.path.join(sf_dir, f"{tname}.parquet"))
        parts = sorted(glob.glob(os.path.join(out_dir, f"{tname}.parquet", "*.parquet")))
        assert len(parts) >= 7, f"{tname}: expected >=7 parts, got {len(parts)}"
        sizes = [pq.read_metadata(p).num_rows for p in parts]
        assert sizes[0] == 0 and sizes[2] == 0, f"{tname}: empty parts missing"
        assert sizes[1] == 1, f"{tname}: 1-row part missing"
        assert pq.read_metadata(parts[3]).num_row_groups >= 3, (
            f"{tname}: micro row groups missing"
        )
        assert sum(sizes) == len(src), f"{tname}: row count changed"


def audit(sf_dir: str, only: list[str] | None = None) -> dict[str, dict]:
    from realtime_voting_data_engineering_spark import queries as Q
    from realtime_voting_data_engineering_spark.session import get_spark
    from tests.oracle_harness import compare_query

    poisoned = poison(sf_dir)
    _sanity_check_poison(sf_dir, poisoned)
    spark = get_spark(app_name="split-audit")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    for name, spec in sorted(Q.REGISTRY.items()):
        if spec.oracle is None or (only and name not in only):
            continue
        try:
            # Spark on the degenerate layout, oracle on the ORIGINAL
            # single file — same row set, so this is a pure layout-
            # invariance check (cross-corpus, like order_audit).
            compare_query(
                spark, name, spec.fn, spec.oracle, poisoned, oracle_sf_dir=sf_dir
            )
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
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()
    only = args.only.split(",") if args.only else None
    rep = audit(args.sf_dir, only)
    bad = {n: r for n, r in rep.items() if r["status"] != "match"}
    print(f"\n# {len(rep)} audited, {len(rep) - len(bad)} match, {len(bad)} flagged")
    for n, r in sorted(bad.items()):
        print(f"--- {n}: {r['status']}\n{r.get('detail', '')[:400]}\n")
