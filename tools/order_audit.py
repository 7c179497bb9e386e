"""Row-order audit: operator-vs-oracle agreement on a row-PERMUTED
corpus — the third adversary class after NULLs (``null_audit``) and
non-finite floats (``float_audit``).

At 100 TB nothing guarantees ingest order: files arrive from thousands
of writers, compaction rewrites partitions, and retries interleave. A
query whose answer depends on the incidental order of rows in the
parquet file — a ``first()`` without an ordering, an argmax with a
non-total tie-break, a limit without a sort — is nondeterministic at
scale even if it looks stable on a single-file local corpus where scan
order happens to be row order.

This audit is an INVARIANCE check, deliberately cross-corpus: Spark
runs on a deterministically md5-PERMUTED copy of every table while the
DuckDB oracle runs on the ORIGINAL corpus. Same-corpus comparison
would miss a query and an oracle that are order-dependent in the same
way (the analogue of the NaN garbage-agreement failure mode the float
audit documents); requiring the permuted-input result to hash-equal
the clean-input oracle proves the declared semantics are a pure
function of the ROW SET, not the row sequence — which is exactly the
property a 1000-executor shuffle-ordered execution needs.

Run: ``python tools/order_audit.py [--sf-dir ...] [--only a,b,c]``
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKDIR = "/tmp/rtv_order_audit"


def poison(sf_dir: str, split: int = 1) -> str:
    """Permute rows; with ``split`` > 1 additionally write each table as
    ``split`` separate part files under a ``<name>.parquet/`` directory.
    The driver corpus is single-file single-row-group, so every scan is
    SERIAL locally — splitting makes Spark plan a genuinely parallel
    multi-partition scan with arbitrary file-to-task assignment, the
    shape a 1000-executor cluster always sees. Results must still be
    invariant (the clean-corpus oracle is the referee)."""
    os.makedirs(WORKDIR, exist_ok=True)
    out_dir = os.path.join(WORKDIR, os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for fname in os.listdir(sf_dir):
        if not fname.endswith(".parquet"):
            continue
        tname = fname[: -len(".parquet")]
        tbl = pq.read_table(os.path.join(sf_dir, fname))
        # Deterministic permutation: sort rows by md5(table|index).
        keys = [
            hashlib.md5(f"{tname}|{i}".encode()).hexdigest()
            for i in range(len(tbl))
        ]
        order = sorted(range(len(tbl)), key=keys.__getitem__)
        tbl = tbl.take(pa.array(order, pa.int64()))
        if split <= 1 or len(tbl) < split:
            pq.write_table(tbl, os.path.join(out_dir, fname))
        else:
            part_dir = os.path.join(out_dir, fname)  # <name>.parquet/ dir
            os.makedirs(part_dir)
            step = (len(tbl) + split - 1) // split
            for p in range(split):
                chunk = tbl.slice(p * step, step)
                if len(chunk):
                    pq.write_table(
                        chunk, os.path.join(part_dir, f"part-{p:03d}.parquet")
                    )
    return out_dir


def _sanity_check_poison(sf_dir: str, out_dir: str, split: int) -> None:
    """The permutation (and split) must actually have happened — a
    silently-broken permuter would reduce the audit to a same-order
    re-run (r7 review)."""
    src = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    dst_path = os.path.join(out_dir, "events.parquet")
    if os.path.isdir(dst_path):
        assert split > 1 and len(os.listdir(dst_path)) > 1, "split missing"
        import glob
        parts = sorted(glob.glob(os.path.join(dst_path, "*.parquet")))
        dst = pq.read_table(parts[0])
    else:
        dst = pq.read_table(dst_path)
    head_src = src.column("event_id").to_pylist()[:50]
    head_dst = dst.column("event_id").to_pylist()[:50]
    assert head_src != head_dst, "permutation produced identical row order"


def audit(
    sf_dir: str, only: list[str] | None = None, split: int = 1
) -> dict[str, dict]:
    from realtime_voting_data_engineering_spark import queries as Q
    from realtime_voting_data_engineering_spark.session import get_spark
    from tests.oracle_harness import compare_query

    poisoned = poison(sf_dir, split=split)
    _sanity_check_poison(sf_dir, poisoned, split)
    spark = get_spark(app_name="order-audit")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    for name, spec in sorted(Q.REGISTRY.items()):
        if spec.oracle is None or (only and name not in only):
            continue
        try:
            # Spark on the permuted corpus, oracle on the ORIGINAL one —
            # see module docstring (invariance, not same-data agreement).
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
    ap.add_argument(
        "--split", type=int, default=1,
        help="write each permuted table as N part files (parallel scans)",
    )
    args = ap.parse_args()
    only = args.only.split(",") if args.only else None
    rep = audit(args.sf_dir, only, split=args.split)
    bad = {n: r for n, r in rep.items() if r["status"] != "match"}
    print(f"\n# {len(rep)} audited, {len(rep) - len(bad)} match, {len(bad)} flagged")
    for n, r in sorted(bad.items()):
        print(f"--- {n}: {r['status']}\n{r.get('detail', '')[:400]}\n")
