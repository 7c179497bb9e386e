"""Extreme-value audit: operator-vs-oracle agreement on in-range but
EXTREME values — the third adversary class after NULLs
(``tools/null_audit.py``) and non-finite floats (``tools/float_audit.py``).

At 100 TB, extreme-but-representable values are as certain as NULLs: a
corrupted sensor emits epoch-0 or year-9999 timestamps, an upstream
serializer writes int64 extremes where an id belongs, a unit bug yields
1e308 where dollars belong. Unlike NaN (which both engines can at least
detect uniformly), these values are VALID for their types — every
operator happily computes with them, so the failure modes are silent
divergence (overflowing arithmetic, sentinel collisions) or resource
explosion (data-derived grids spanning 300k years).

What gets poisoned (deterministic md5 masks, like the sibling audits):

- ``events.ts`` (~1.5%): epoch 0, 0001-01-01, 9999-12-31, year ~33658
  (2^60 us), and a pre-Gregorian 1582 date — exercises every time
  bucketing / windowing / sessionization / gap-fill path. Notably the
  gap-fill grid is DERIVED from min/max(ts): one year-33658 row asks
  ``sequence()`` for ~300M hourly buckets per series, the
  one-malformed-row-kills-the-job class in resource form.
- ``events.value`` (~2%): ±1e308 (finite, but sums overflow to Inf and
  any DECIMAL cast is out of range in BOTH engines — ANSI Spark throws,
  the whole job dies), 5e-324 denormal, and ±1.1e12 (just above the
  decimal(18,6) domain the ``dec()`` contract casts into).
- ``events.event_id`` / ``events.user_id`` / ``documents.doc_id`` /
  ``embeddings.vec_id`` (~2%): int64 max, min+1, ±2^62 — exercises
  group-by/join/window keys, hash derivations (xxhash64/md5 must not
  pre-round), Arrow id transport (float64 coercion silently rounds ids
  above 2^53), and id tie-breaks. min+1 rather than min: abs(min)
  overflows int64 and min is pandas' NaT/NA sentinel — poisoning it
  would audit pandas, not the engine contract.

Poisoned ids may collide (two rows drawn to the same extreme) — that is
intentional; the duplicate-row totality contract (r6) must hold under
extreme keys too.

Run: ``python tools/extreme_audit.py [--sf-dir ...] [--only a,b,c]``
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

WORKDIR = "/tmp/rtv_extreme_audit"

TS_FRACTION = 0.015
VALUE_FRACTION = 0.02
ID_FRACTION = 0.02

#: Extreme timestamps in MICROSECONDS since the epoch (events.ts is
#: timestamp[us]). Kept clear of int64 max/min (DuckDB's ±infinity
#: sentinels — a separate, documented engine boundary).
TS_EXTREMES_US = (
    0,                                   # epoch 0
    -62_135_596_800_000_000,             # 0001-01-01
    253_402_300_799_999_999,             # 9999-12-31 23:59:59.999999
    1_152_921_504_606_846_976,           # 2^60 us ≈ year 38503
    -12_219_292_800_000_000,             # 1582-10-15 (Gregorian cutover)
)

#: A TIMESTAMP(NANOS) column cannot represent most of the µs extremes
#: (its int64 span is only 1677–2262), and blindly casting the µs
#: numbers into a ns column would divide every extreme by 1000 and land
#: them all IN-window — auditing nothing (r7 review finding). The ns
#: corruption class is the representable boundary instead.
TS_EXTREMES_NS = (
    0,                                   # epoch 0
    -9_223_372_036_854_000_000,          # ~1677-09-21 (ns range floor)
    9_223_372_036_854_000_000,           # ~2262-04-11 (ns range ceiling)
    4_611_686_018_427_387_904,           # 2^62 ns ≈ 2116
    -4_611_686_018_427_387_904,          # ≈ 1823
)


def _ts_extremes_for(unit: str):
    if unit == "us":
        return TS_EXTREMES_US
    if unit == "ns":
        return TS_EXTREMES_NS
    if unit == "ms":
        return tuple(v // 1000 for v in TS_EXTREMES_US)
    if unit == "s":
        return tuple(v // 1_000_000 for v in TS_EXTREMES_US)
    raise ValueError(f"unsupported timestamp unit {unit!r}")


#: 12345678901.234567 sits in the double->DECIMAL(18,6) divergence
#: window (|v| > 2^53/10^6 ≈ 9.0e9 but inside the decimal domain):
#: DuckDB's native conversion multiplies by 10^scale in FLOATING POINT
#: and rounds to the double grid (spacing 128 at 1e18) where Spark
#: converts via the shortest decimal string (exact) — a real silent
#: divergence this probe value permanently catches; oracles mirror
#: Spark with TRY_CAST(CAST(x AS VARCHAR) AS DECIMAL(...)).
VALUE_EXTREMES = (
    1e308, -1e308, 5e-324, 1.1e12, -1.1e12,
    12345678901.234567, -98765432109.87654,
)

ID_EXTREMES = (
    9_223_372_036_854_775_807,           # int64 max
    -9_223_372_036_854_775_807,          # int64 min + 1
    4_611_686_018_427_387_904,           # 2^62
    -4_611_686_018_427_387_904,
)


def _draw(table: str, col: str, i: int) -> tuple[float, int]:
    """Deterministic (uniform [0,1), pick-index) per (table, col, row)."""
    h = hashlib.md5(f"{table}|{col}|{i}".encode()).digest()
    return h[0] / 255.0, h[1]


def _poison_column(tbl: pa.Table, tname: str, col: str, fraction: float, extremes):
    j = tbl.schema.get_field_index(col)
    field = tbl.schema.field(j)
    vals = tbl.column(j).to_pylist()
    out = []
    n_poisoned = 0
    for i, v in enumerate(vals):
        u, pick = _draw(tname, col, i)
        if v is not None and u < fraction:
            v = extremes[pick % len(extremes)]
            n_poisoned += 1
        out.append(v)
    assert n_poisoned > 0, f"no rows poisoned in {tname}.{col}"
    if pa.types.is_timestamp(field.type):
        arr = pa.array(
            [None if v is None else int(v) for v in out], pa.int64()
        ).cast(field.type)
    else:
        arr = pa.array(out, field.type)
    return tbl.set_column(j, field, arr)


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
            # ts arrives as datetimes from to_pylist; round-trip via int64
            j = tbl.schema.get_field_index("ts")
            ts_field = tbl.schema.field(j)
            extremes = _ts_extremes_for(ts_field.type.unit)
            raw = tbl.column(j).cast(pa.int64()).to_pylist()
            tbl = tbl.set_column(
                j, ts_field,
                pa.array(
                    [
                        v if v is None or _draw("events", "ts", i)[0] >= TS_FRACTION
                        else extremes[_draw("events", "ts", i)[1] % len(extremes)]
                        for i, v in enumerate(raw)
                    ],
                    pa.int64(),
                ).cast(ts_field.type),
            )
            tbl = _poison_column(tbl, "events", "value", VALUE_FRACTION, VALUE_EXTREMES)
            tbl = _poison_column(tbl, "events", "event_id", ID_FRACTION, ID_EXTREMES)
            tbl = _poison_column(tbl, "events", "user_id", ID_FRACTION, ID_EXTREMES)
            pq.write_table(tbl, dst)
        elif tname == "documents":
            tbl = pq.read_table(src)
            tbl = _poison_column(tbl, "documents", "doc_id", ID_FRACTION, ID_EXTREMES)
            pq.write_table(tbl, dst)
        elif tname == "embeddings":
            tbl = pq.read_table(src)
            tbl = _poison_column(tbl, "embeddings", "vec_id", ID_FRACTION, ID_EXTREMES)
            pq.write_table(tbl, dst)
        else:
            shutil.copy(src, dst)
    return out_dir


def audit(sf_dir: str, only: list[str] | None = None) -> dict[str, dict]:
    from realtime_voting_data_engineering_spark import queries as Q
    from realtime_voting_data_engineering_spark.session import get_spark
    from tests.oracle_harness import compare_query

    poisoned = poison(sf_dir)
    spark = get_spark(app_name="extreme-audit")
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
