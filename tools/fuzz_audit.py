"""Seeded random-composition audit (fuzz audit): operator-vs-oracle
agreement on corpora where EVERY adversary class this repo has
catalogued is applied at once, with seed-varied masks and rates.

The sibling audits are fixed-mask: ``null_audit`` always NULLs the same
~5% of rows, ``float_audit`` always NaNs the same ~2%, ``extreme_audit``
always picks the same extreme per row, and the r7 "maximum stack" layers
those three FIXED masks. Fixed masks prove the classes are handled, but
a mask-POSITION-dependent bug stays invisible — e.g. an argmax whose
tie-break only breaks when the NULL lands on the group's winning row, or
a window frame that only misbehaves when the extreme timestamp is the
per-key minimum. This tool samples that space: each ``--seed`` derives
fresh per-(table, column, class) rates AND fresh per-row masks, so every
seed is a new composition of the same certified adversary classes.

Two classes appear here at full-registry scope for the first time:

- **Duplicate rows + hot-key skew**: after cell mutation, ~1-3% of rows
  are replicated verbatim 1-3x and two "hot" rows per table are
  replicated tens of times (the r6 duplicate-row totality contract —
  set-semantics indexes, total tie-breaks — was previously pinned only
  on the text/embedding pytest corpora, not across all 98 oracles).
  Replication is VERBATIM and post-mutation on purpose: id-colliding
  rows with differing payloads are already injected by the extreme-id
  class, under the documented ``unique_by_id`` / totality contracts.
- **Text-content mutation**: case-swapped, whitespace-only, and
  mixed-script variants of document/dimension strings (the r6
  Unicode-case corpus generalized beyond the fingerprint family). Both
  engines compare strings bytewise, so agreement is expected — but
  measured, not assumed, exactly like the NaN-ordering facts.

Corpus layout follows ``order_audit``'s cross-corpus invariance design:
Spark reads the mutated corpus md5-PERMUTED and SPLIT into a seeded
number of part files (the multi-writer layout a 1000-executor cluster
always sees); the DuckDB oracle reads a single-file, unpermuted copy of
the SAME row set. A hash match therefore certifies, per seed, that the
declared semantics are a pure function of the mutated row SET under the
full adversary composition.

Run: ``python tools/fuzz_audit.py [--seeds 1,2,3] [--sf-dir ...]
[--only a,b,c]``
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

from tools.extreme_audit import (  # noqa: E402 — sibling audit constants
    ID_EXTREMES,
    VALUE_EXTREMES,
    _ts_extremes_for,
)

WORKDIR = "/tmp/rtv_fuzz_audit"

#: Per-class base rate bounds (lo, hi); the seed draws each column's
#: actual rate uniformly inside its bound, so total mutation density
#: varies run to run but stays low enough that the data keeps meaning.
RATE_BOUNDS = {
    "null": (0.01, 0.06),
    "empty": (0.005, 0.03),
    "ws": (0.005, 0.02),       # whitespace-only string
    "case": (0.01, 0.04),      # case-swapped string
    "script": (0.005, 0.02),   # mixed-script suffix
    "nan": (0.005, 0.02),
    "pinf": (0.003, 0.01),
    "ninf": (0.003, 0.01),
    "extreme": (0.005, 0.02),
    "emb_null": (0.01, 0.04),
    "emb_nonfinite": (0.01, 0.03),
    "emb_ragged": (0.005, 0.02),
    "dup": (0.01, 0.03),
}

#: Which mutation classes apply to which (table, column). Mirrors the
#: union of the sibling audits' poison sets; TPC-H monetary columns stay
#: finite (the decimal-domain ingest contract, see float_audit) but do
#: get NULLs, and keys get extremes-with-collisions, never NULLs.
PLAN: dict[str, dict[str, tuple[str, ...]]] = {
    "events": {
        "ts": ("null", "extreme"),
        "value": ("null", "nan", "pinf", "ninf", "extreme"),
        "event_type": ("null", "empty", "case"),
        "props": ("null", "empty"),
        "user_id": ("null", "extreme"),
        "event_id": ("extreme",),
    },
    "documents": {
        "doc_id": ("extreme",),
        "text": ("null", "empty", "ws", "case", "script"),
        "lang": ("null", "empty"),
        "source": ("null", "empty"),
        "n_chars": ("null",),
    },
    "embeddings": {
        "vec_id": ("extreme",),
        "embedding": ("emb_null", "emb_nonfinite", "emb_ragged"),
    },
    "lineitem": {
        "l_quantity": ("null",),
        "l_extendedprice": ("null",),
        "l_discount": ("null",),
        "l_tax": ("null",),
        "l_returnflag": ("null", "case"),
        "l_linestatus": ("null", "case"),
        "l_shipdate": ("null",),
    },
    "orders": {
        "o_orderdate": ("null",),
        "o_totalprice": ("null",),
        "o_orderpriority": ("null", "case"),
        "o_orderstatus": ("null",),
    },
    "customer": {
        "c_name": ("null", "case"),
        "c_acctbal": ("null",),
        "c_mktsegment": ("null", "case"),
        "c_nationkey": ("null",),
    },
    "part": {
        "p_brand": ("null", "case"),
        "p_type": ("null", "case"),
        "p_size": ("null",),
        "p_retailprice": ("null",),
    },
    "supplier": {
        "s_acctbal": ("null",),
    },
    # region/nation stay clean (tiny dims; see null_audit rationale).
}

#: Tables that get duplicate-row + hot-key injection. Dimension tables
#: are excluded: duplicating a nation row is a referential-integrity
#: violation (fan-out in every join), which is ingest validation's
#: problem, not per-query semantics.
DUP_TABLES = ("events", "documents", "embeddings", "lineitem", "customer")


def _h(seed: int, *parts) -> bytes:
    return hashlib.md5("|".join(str(p) for p in (seed, *parts)).encode()).digest()


def _u(seed: int, *parts) -> float:
    """Deterministic uniform [0, 1) with 32-bit granularity."""
    return int.from_bytes(_h(seed, *parts)[:4], "big") / 2**32


def _rate(seed: int, table: str, col: str, cls: str) -> float:
    lo, hi = RATE_BOUNDS[cls]
    return lo + (hi - lo) * _u(seed, "rate", table, col, cls)


def _case_swap(s: str) -> str:
    return s.swapcase()


_SCRIPT_SUFFIXES = (" ßİı", " 你好", " пр", " \U0001f600")


def _mutate_string(seed: int, table: str, col: str, i: int, v, classes):
    pick = _h(seed, "pick", table, col, i)
    off = 0.0
    u = _u(seed, "cell", table, col, i)
    for cls in classes:
        r = _rate(seed, table, col, cls)
        if u < off + r:
            if cls == "null":
                return None
            if cls == "empty":
                return ""
            if cls == "ws":
                return " \t\n " * (1 + pick[2] % 3)
            if cls == "case":
                return _case_swap(v) if v is not None else v
            if cls == "script":
                return (v or "") + _SCRIPT_SUFFIXES[pick[3] % len(_SCRIPT_SUFFIXES)]
            raise AssertionError(cls)
        off += r
    return v


def _mutate_scalar(seed: int, table: str, col: str, i: int, v, classes, extremes):
    pick = _h(seed, "pick", table, col, i)
    off = 0.0
    u = _u(seed, "cell", table, col, i)
    for cls in classes:
        r = _rate(seed, table, col, cls)
        if u < off + r:
            if cls == "null":
                return None
            if cls == "nan":
                return float("nan")
            if cls == "pinf":
                return float("inf")
            if cls == "ninf":
                return float("-inf")
            if cls == "extreme":
                return extremes[pick[2] % len(extremes)]
            raise AssertionError(cls)
        off += r
    return v


def _mutate_embedding(seed: int, table: str, col: str, i: int, v, classes):
    pick = _h(seed, "pick", table, col, i)
    off = 0.0
    u = _u(seed, "cell", table, col, i)
    for cls in classes:
        r = _rate(seed, table, col, cls)
        if u < off + r:
            if cls == "emb_null":
                return None
            if v is None:
                return v
            if cls == "emb_nonfinite":
                out = list(v)
                out[pick[2] % len(out)] = (
                    float("nan"), float("inf"), float("-inf")
                )[pick[3] % 3]
                return out
            if cls == "emb_ragged":
                return list(v)[: 1 + pick[2] % (len(v) - 1)]
            raise AssertionError(cls)
        off += r
    return v


def _mutate_column(seed: int, tbl: pa.Table, tname: str, col: str, classes):
    j = tbl.schema.get_field_index(col)
    field = tbl.schema.field(j)
    t = field.type
    if pa.types.is_timestamp(t):
        raw = tbl.column(j).cast(pa.int64()).to_pylist()
        extremes = _ts_extremes_for(t.unit)
        out = [
            _mutate_scalar(seed, tname, col, i, v, classes, extremes)
            if v is not None
            else v
            for i, v in enumerate(raw)
        ]
        arr = pa.array(out, pa.int64()).cast(t)
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        vals = tbl.column(j).to_pylist()
        out = [
            _mutate_embedding(seed, tname, col, i, v, classes)
            for i, v in enumerate(vals)
        ]
        arr = pa.array(out, t)
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        vals = tbl.column(j).to_pylist()
        out = [
            _mutate_string(seed, tname, col, i, v, classes)
            for i, v in enumerate(vals)
        ]
        arr = pa.array(out, t)
    else:
        vals = tbl.column(j).to_pylist()
        extremes = VALUE_EXTREMES if pa.types.is_floating(t) else ID_EXTREMES
        out = [
            _mutate_scalar(seed, tname, col, i, v, classes, extremes)
            if v is not None
            else v
            for i, v in enumerate(vals)
        ]
        arr = pa.array(out, t)
    return tbl.set_column(j, field, arr)


def _duplicate_rows(seed: int, tbl: pa.Table, tname: str) -> pa.Table:
    """Verbatim post-mutation replication: ~1-3% of rows 1-3x extra,
    plus two hot rows replicated 20-60x (hot-key skew)."""
    n = len(tbl)
    if n == 0:
        return tbl
    p_dup = _rate(seed, tname, "_row", "dup")
    idx: list[int] = []
    for i in range(n):
        idx.append(i)
        h = _h(seed, "dup", tname, i)
        if int.from_bytes(h[:4], "big") / 2**32 < p_dup:
            idx.extend([i] * (1 + h[4] % 3))
    for j in range(2):
        h = _h(seed, "hot", tname, j)
        hot_i = int.from_bytes(h[:4], "big") % n
        idx.extend([hot_i] * (20 + h[4] % 41))
    return tbl.take(pa.array(idx, pa.int64()))


def _permute(seed: int, tbl: pa.Table, tname: str) -> pa.Table:
    keys = [_h(seed, "perm", tname, i) for i in range(len(tbl))]
    order = sorted(range(len(tbl)), key=keys.__getitem__)
    return tbl.take(pa.array(order, pa.int64()))


def poison(sf_dir: str, seed: int) -> tuple[str, str]:
    """Build the seed's corpus pair: (spark_dir permuted+split,
    oracle_dir single-file same rows)."""
    base = os.path.join(WORKDIR, f"seed{seed}")
    spark_dir = os.path.join(base, "spark")
    oracle_dir = os.path.join(base, "oracle")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(spark_dir)
    os.makedirs(oracle_dir)
    n_mutated = 0
    for fname in sorted(os.listdir(sf_dir)):
        if not fname.endswith(".parquet"):
            continue
        tname = fname[: -len(".parquet")]
        tbl = pq.read_table(os.path.join(sf_dir, fname))
        before = tbl
        for col, classes in PLAN.get(tname, {}).items():
            tbl = _mutate_column(seed, tbl, tname, col, classes)
        # Small tables (supplier is ~10 rows at sf0.001) can draw zero
        # mutations at these rates; require the poison to be visibly
        # present only where the law of large numbers guarantees it.
        if tname in ("events", "documents", "lineitem") and tbl.equals(before):
            raise AssertionError(f"seed {seed}: no cells mutated in {tname}")
        n_mutated += int(tname in PLAN and not tbl.equals(before))
        if tname in DUP_TABLES:
            tbl = _duplicate_rows(seed, tbl, tname)
        pq.write_table(tbl, os.path.join(oracle_dir, fname))
        # Spark side: permute the expanded table, split into 1-8 files.
        ptbl = _permute(seed, tbl, tname)
        split = 1 + _h(seed, "split", tname)[0] % 8
        if split <= 1 or len(ptbl) < split:
            pq.write_table(ptbl, os.path.join(spark_dir, fname))
        else:
            part_dir = os.path.join(spark_dir, fname)  # <name>.parquet/ dir
            os.makedirs(part_dir)
            step = (len(ptbl) + split - 1) // split
            for p in range(split):
                chunk = ptbl.slice(p * step, step)
                if len(chunk):
                    pq.write_table(
                        chunk, os.path.join(part_dir, f"part-{p:03d}.parquet")
                    )
    assert n_mutated > 0, "fuzz poison touched no tables"
    return spark_dir, oracle_dir


def audit(
    sf_dir: str, seed: int, only: list[str] | None = None
) -> dict[str, dict]:
    from realtime_voting_data_engineering_spark import queries as Q
    from realtime_voting_data_engineering_spark.session import get_spark
    from tests.oracle_harness import compare_query

    spark_dir, oracle_dir = poison(sf_dir, seed)
    spark = get_spark(app_name=f"fuzz-audit-{seed}")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    for name, spec in sorted(Q.REGISTRY.items()):
        if spec.oracle is None or (only and name not in only):
            continue
        try:
            compare_query(
                spark, name, spec.fn, spec.oracle, spark_dir,
                oracle_sf_dir=oracle_dir,
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
            json.dumps(
                {"seed": seed, "query": name, "status": report[name]["status"]}
            ),
            flush=True,
        )
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--seeds", default="1", help="comma-separated ints")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()
    only = args.only.split(",") if args.only else None
    total = bad_total = 0
    for seed in (int(s) for s in args.seeds.split(",")):
        rep = audit(args.sf_dir, seed, only)
        bad = {n: r for n, r in rep.items() if r["status"] != "match"}
        total += len(rep)
        bad_total += len(bad)
        print(
            f"\n# seed {seed}: {len(rep)} audited, "
            f"{len(rep) - len(bad)} match, {len(bad)} flagged"
        )
        for n, r in sorted(bad.items()):
            print(f"--- {n}: {r['status']}\n{r.get('detail', '')[:400]}\n")
    print(f"\n## all seeds: {total} audited, {bad_total} flagged")
    sys.exit(1 if bad_total else 0)
