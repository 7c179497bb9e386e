"""Non-finite-float audit: operator-vs-oracle agreement on NaN / ±Inf —
the float analogue of the r6 NULL audit (``tools/null_audit.py``).

At 100 TB non-finite floats are as certain as NULLs: NaN from 0/0 in an
upstream derivation, ±Inf from overflow or a log(0), and poisoned
embedding components from a failed encoder batch. Cross-engine probes on
this container show Spark and DuckDB AGREE on total ordering (NaN
greatest, above +Inf, in both ORDER BY and min/max), on comparison
filters, and on NaN-propagating sum/avg — but DIVERGE on interpolated
percentiles over a NaN-bearing run (Spark percentile → the finite-run
answer vs DuckDB quantile_cont → an Inf/NaN-shifted pick) and DuckDB
ERRORS outright where Spark yields NULL/NaN (CAST(NaN AS DECIMAL),
STDDEV over non-finite). So agreement must be measured, not assumed.

What gets poisoned (deterministic md5 masks, like the NULL audit):

- ``events.value``: ~2% NaN, ~1% +Inf, ~1% −Inf — exercises quartile /
  window-rank / running-sum / gap-fill / reconciliation semantics.
- ``embeddings.embedding``: one component of ~4% of vectors set to
  NaN or ±Inf — exercises every vector-kernel boundary (a non-finite
  component turns a cosine into NaN, and NaN sorts ABOVE every real
  score in descending top-k in BOTH engines — garbage neighbors would
  win identically on both sides, hash-matching while being
  semantically wrong, which is why the vector boundary must EXCLUDE
  non-finite vectors rather than rank them).

What deliberately stays clean: TPC-H monetary columns. They carry the
repo's decimal-cast determinism contract (see ``queries.py`` module
docstring); DuckDB cannot even CAST a NaN to DECIMAL (hard error), i.e.
non-finite money is a schema-contract violation that belongs to ingest
validation, not to every downstream aggregate. PARITY.md records this
as the documented finiteness contract of the decimal family.

Run: ``python tools/float_audit.py [--sf-dir ...] [--only a,b,c]``
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKDIR = "/tmp/rtv_float_audit"

NAN_FRACTION = 0.02
POS_INF_FRACTION = 0.01
NEG_INF_FRACTION = 0.01
EMB_POISON_FRACTION = 0.04


def _bucket(table: str, col: str, i: int) -> float:
    """Deterministic uniform [0,1) per (table, col, row)."""
    h = hashlib.md5(f"{table}|{col}|{i}".encode()).digest()
    return h[0] / 255.0


def _poison_value(u: float, orig):
    """Map the uniform draw to NaN / +Inf / −Inf / unchanged."""
    if u < NAN_FRACTION:
        return float("nan")
    if u < NAN_FRACTION + POS_INF_FRACTION:
        return float("inf")
    if u < NAN_FRACTION + POS_INF_FRACTION + NEG_INF_FRACTION:
        return float("-inf")
    return orig


def poison(sf_dir: str) -> str:
    os.makedirs(WORKDIR, exist_ok=True)
    out_dir = os.path.join(WORKDIR, os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for fname in os.listdir(sf_dir):
        if not fname.endswith(".parquet"):
            continue
        tname = fname[: -len(".parquet")]
        src = os.path.join(sf_dir, fname)
        dst = os.path.join(out_dir, fname)
        if tname == "events":
            tbl = pq.read_table(src)
            j = tbl.schema.get_field_index("value")
            vals = tbl.column(j).to_pylist()
            vals = [
                None if v is None else _poison_value(_bucket("events", "value", i), v)
                for i, v in enumerate(vals)
            ]
            tbl = tbl.set_column(
                j, tbl.schema.field(j), pa.array(vals, tbl.schema.field(j).type)
            )
            pq.write_table(tbl, dst)
        elif tname == "embeddings":
            tbl = pq.read_table(src)
            j = tbl.schema.get_field_index("embedding")
            vecs = tbl.column(j).to_pylist()
            out = []
            for i, vec in enumerate(vecs):
                u = _bucket("embeddings", "embedding", i)
                if vec and u < EMB_POISON_FRACTION:
                    vec = list(vec)
                    # which component and which poison, also deterministic
                    h = hashlib.md5(f"emb|pick|{i}".encode()).digest()
                    comp = h[1] % len(vec)
                    vec[comp] = [float("nan"), float("inf"), float("-inf")][h[2] % 3]
                out.append(vec)
            tbl = tbl.set_column(
                j, tbl.schema.field(j), pa.array(out, tbl.schema.field(j).type)
            )
            pq.write_table(tbl, dst)
        else:
            shutil.copy(src, dst)
    return out_dir


def audit(sf_dir: str, only: list[str] | None = None) -> dict[str, dict]:
    from realtime_voting_data_engineering_spark import queries as Q
    from realtime_voting_data_engineering_spark.session import get_spark
    from tests.oracle_harness import compare_query

    poisoned = poison(sf_dir)
    _sanity_check_poison(poisoned)  # a broken injector must fail loudly,
    # not let every query trivially "match" on effectively-clean data
    spark = get_spark(app_name="float-audit")
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
            report[name] = {
                "status": "error",
                "detail": f"{type(exc).__name__}: {str(exc)[:300]}",
            }
        print(
            json.dumps({"query": name, "status": report[name]["status"]}),
            flush=True,
        )
    return report


def _sanity_check_poison(out_dir: str) -> None:
    """The poison must actually be present (guards the audit itself)."""
    tbl = pq.read_table(os.path.join(out_dir, "events.parquet"))
    vals = [v for v in tbl.column("value").to_pylist() if v is not None]
    n_nan = sum(1 for v in vals if isinstance(v, float) and math.isnan(v))
    n_inf = sum(1 for v in vals if isinstance(v, float) and math.isinf(v))
    assert n_nan and n_inf, (n_nan, n_inf)


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
