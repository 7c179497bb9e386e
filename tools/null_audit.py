"""NULL-injection audit: operator-vs-oracle agreement on data the clean
driver corpus never exercises.

Both latent divergences found by review so far (CDC tombstones with NULL
event_type; fingerprints of NULL text) were NULL-semantics edges that
sf* testdata leaves dormant because its columns happen to be fully
populated. This tool makes that class of bug visible on demand:

1. Copy sf0.001 to /tmp, deterministically NULL-ing ~5% of the values in
   every analytic (non-key) column — plus a few empty strings in text
   columns, which are a distinct edge (``''`` vs NULL).
2. Run EVERY oracled query through the same Spark-vs-DuckDB compare the
   correctness suite uses (``tests.oracle_harness.compare_query``) on
   the poisoned corpus.
3. Report match / mismatch / error per query.

A mismatch here is not automatically a bug — some operators have a
documented non-null contract (e.g. embedding kernels) — but every
mismatch must be either fixed or documented as contractual. Keys
(doc_id, *_orderkey, vec_id, ...) are left intact: the audit probes
value/measure/dimension semantics, not referential integrity.

Run: ``python tools/null_audit.py [--sf-dir /root/testdata/sf0.001]``
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKDIR = "/tmp/rtv_null_audit"

#: Columns to poison, per table. Keys and join columns stay intact.
INJECT: dict[str, list[str]] = {
    "documents": ["text", "lang", "source", "n_chars"],
    # ts joined the poison set in r7: the event-time validity window
    # (functions.scalar.valid_event_ts) folds extreme timestamps to
    # NULL, making NULL-ts a first-class flow every time-consuming
    # query must handle — windows over ts pin NULLS FIRST/LAST
    # explicitly because the engines' ASC defaults differ.
    "events": ["event_type", "value", "props", "user_id", "ts"],
    "lineitem": [
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ],
    "orders": ["o_orderdate", "o_totalprice", "o_orderpriority", "o_orderstatus"],
    "customer": ["c_name", "c_acctbal", "c_mktsegment", "c_nationkey"],
    "part": ["p_brand", "p_type", "p_size", "p_retailprice"],
    "supplier": ["s_acctbal"],
    "embeddings": ["embedding"],
    # region/nation: tiny dims, poisoning them breaks half of TPC-H's
    # premise without exercising anything new. NULL embeddings are fair
    # game since r6: vector operators EXCLUDE invalid rows at the
    # boundary (similarity.valid_vectors) instead of crashing the job,
    # and the oracles declare the same exclusion.
}

NULL_FRACTION = 0.05
EMPTY_FRACTION = 0.03  # string columns also get empty strings


def _det_mask(table_rows: int, table: str, col: str, salt: str, frac: float):
    """Deterministic per-row mask from md5(table|col|salt|row) — stable
    across runs, independent of numpy RNG versions."""
    out = []
    for i in range(table_rows):
        h = hashlib.md5(f"{table}|{col}|{salt}|{i}".encode()).digest()
        out.append((h[0] / 255.0) < frac)
    return pa.array(out, type=pa.bool_())


def poison(sf_dir: str) -> str:
    os.makedirs(WORKDIR, exist_ok=True)
    out_dir = os.path.join(WORKDIR, os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for fname in os.listdir(sf_dir):
        if not fname.endswith(".parquet"):
            continue
        tname = fname[: -len(".parquet")]
        tbl = pq.read_table(os.path.join(sf_dir, fname))
        for col in INJECT.get(tname, []):
            idx = tbl.schema.get_field_index(col)
            arr = tbl.column(idx).combine_chunks()
            null_mask = _det_mask(len(tbl), tname, col, "null", NULL_FRACTION)
            arr = pc.if_else(null_mask, pa.scalar(None, type=arr.type), arr)
            if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
                empty_mask = _det_mask(len(tbl), tname, col, "empty", EMPTY_FRACTION)
                arr = pc.if_else(empty_mask, pa.scalar("", type=arr.type), arr)
            tbl = tbl.set_column(idx, tbl.schema.field(idx), arr)
        pq.write_table(tbl, os.path.join(out_dir, fname))
    return out_dir


def _sanity_check_poison(out_dir: str) -> None:
    """The poison must actually be present — a silently-broken injector
    would let every query trivially 'match' on clean data (r7 review)."""
    tbl = pq.read_table(os.path.join(out_dir, "events.parquet"))
    n_null = tbl.column("value").null_count + tbl.column("user_id").null_count
    assert n_null > 0, "NULL injection produced no NULLs"


def audit(sf_dir: str, only: list[str] | None = None) -> dict[str, dict]:
    from realtime_voting_data_engineering_spark import queries as Q
    from realtime_voting_data_engineering_spark.session import get_spark
    from tests.oracle_harness import compare_query

    poisoned = poison(sf_dir)
    _sanity_check_poison(poisoned)
    spark = get_spark(app_name="null-audit")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    for name, spec in sorted(Q.REGISTRY.items()):
        if spec.oracle is None or (only and name not in only):
            continue
        try:
            compare_query(spark, name, spec.fn, spec.oracle, poisoned)
            report[name] = {"status": "match"}
        except AssertionError as exc:
            report[name] = {"status": "mismatch", "detail": str(exc)[:500]}
        except Exception as exc:  # noqa: BLE001 — audit must survive any query
            report[name] = {"status": "error", "detail": f"{type(exc).__name__}: {str(exc)[:300]}"}
        print(json.dumps({"query": name, **{k: v for k, v in report[name].items() if k == 'status'}}), flush=True)
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
