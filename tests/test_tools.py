"""Smoke coverage for the diagnostic tooling (tools/scale_probe.py):
the probe must keep running end to end as operators evolve — it is the
repo's measured-scaling evidence (SCALE.md "Round-6 measured scaling")."""

from __future__ import annotations

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools import scale_probe


def test_probe_runs_and_reports_all_ops(spark, sf_smoke):
    results = scale_probe.probe(sf_smoke, factors=[1, 2])
    ops = {r["op"] for r in results}
    assert {
        "q1_shape_agg",
        "q18_shape_semijoin",
        "minhash_pairs_lin",
        "cc_lin",
        "minhash_pairs_dupfarm",
        "cc_dupfarm",
    } <= ops
    # replication doubles the verified-pair universe in the lin regime
    by = {(r["op"], r["k"]): r for r in results}
    assert by[("minhash_pairs_lin", 2)]["rows"] == 2 * by[("minhash_pairs_lin", 1)]["rows"]
    assert all(r["sec"] >= 0 for r in results)
