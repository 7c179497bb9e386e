"""Local replica of the driver's correctness gate: run a Spark query and
its DuckDB oracle on the same parquet tables, compare row count, column
names, and an order-insensitive value comparison.

Stricter than the driver where possible: values are compared exactly
(after canonical string rendering), so any engine nondeterminism shows up
here first.
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb

from realtime_voting_data_engineering_spark.sources.tables import TABLE_NAMES


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _canon(v) -> str:
    """Canonical render so Spark/DuckDB values compare equal when
    semantically identical."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr keeps full double precision; -0.0 folded to 0.0
        return repr(v + 0.0 if v == 0 else v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalize(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Sort columns by name (driver semantics), canonicalize values, sort
    rows — order-insensitive comparable form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def compare_query(spark, name: str, fn, oracle: str, sf_dir: str) -> None:
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    duck_cols, duck_rows = duckdb_run(oracle, sf_dir)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} "
        f"oracle={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} oracle={len(duck_rows)}"
    )
    s_norm = normalize(spark_cols, spark_rows)
    d_norm = normalize(duck_cols, duck_rows)
    if s_norm != d_norm:
        diffs = [
            (a, b) for a, b in zip(s_norm, d_norm) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs oracle): {diffs}"
        )
