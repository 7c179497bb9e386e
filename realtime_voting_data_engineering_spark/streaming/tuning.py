"""Scale-coupled tuning rules for stateful streaming legs (r16,
optimization guide §2.1/§5 applied to micro-batch state stores).

The cost model: every shuffle partition of a stateful streaming
aggregate materializes ONE state store, and every micro-batch pays that
store's commit (delta file write + version bookkeeping) whether or not
the partition holds any state. Partitions beyond the number of distinct
grouping keys can never hold state, so each one is pure per-batch
overhead. Measured on the bench's smoke (3-candidate grouped aggregate,
local[32], quiet): 32 partitions → 52-65k events/s; 3 partitions →
118-130k; 8 → 110k; 16 → 86k — the throughput curve is exactly the
empty-store commit count.

The rule is derived from INPUT METRICS, never a constant tuned for
local mode: at production key cardinalities (monotone in data size —
millions of candidates/locations/sessions) ``expected_state_rows``
exceeds any cluster's parallelism and the rule returns the session's
parallelism unchanged — the narrowing only fires when the state
cardinality is provably below the core count, the same
honest-at-any-scale gating as ``sources.tables.widen_small_scan``.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


def state_shuffle_partitions(
    parallelism: int, expected_state_rows: "int | None"
) -> int:
    """Principled ``spark.sql.shuffle.partitions`` for ONE stateful
    streaming query: enough partitions to use the cluster, never more
    than the state has distinct keys (each excess partition is an empty
    state store committed every micro-batch).

    ``expected_state_rows`` is the caller's measured/known distinct-key
    count for the stateful operator (e.g. ``candidates.count()`` for a
    per-candidate aggregate). None/<=0 means "unknown — don't narrow":
    the session's parallelism comes back unchanged, because guessing
    low on an unbounded key space would concentrate real state into too
    few stores at scale."""
    par = max(1, parallelism)
    if expected_state_rows is None or expected_state_rows <= 0:
        return par
    return max(1, min(par, expected_state_rows))


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int):
    """Set ``spark.sql.shuffle.partitions`` around ONE streaming query's
    lifetime (the value is read at query start and pinned into its
    checkpoint), restoring the previous value afterwards so batch plans
    in the same session are untouched."""
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, before)
