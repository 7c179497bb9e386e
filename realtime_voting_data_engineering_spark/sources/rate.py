"""Rate-source vote stream (reference W7): the test/dev stand-in for the
Kafka ingest path, at the reference's by-construction throttle of
2 votes/s (voting.py:93 ``time.sleep(0.5)``) or any other rate.

The synthesized vote rides the same downstream pipeline as a parsed
Kafka vote: deterministic per-voter candidate assignment (SURVEY.md §7 —
``pmod(xxhash64(voter_id, seed), n)``, not arrival-order RNG), an
event-time column, and ``vote = 1``. Ingest control maps to the same
knobs production uses: ``rowsPerSecond`` here, ``maxOffsetsPerTrigger``
on the Kafka source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REFERENCE_VOTES_PER_SECOND = 2  # voting.py:93 — one vote per 0.5 s sleep


def vote_rate_stream(
    spark: SparkSession,
    rows_per_second: int = REFERENCE_VOTES_PER_SECOND,
    n_candidates: int = 3,
    seed: int = 21,
) -> DataFrame:
    """Streaming DataFrame of synthetic votes at a controlled rate:
    (voter_id, candidate_id, voting_time, vote). ``value`` from the rate
    source becomes the voter id; candidate assignment is the J1
    broadcast-join semantics folded to its hash expression."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
        .select(
            F.concat(F.lit("voter-"), F.col("value")).alias("voter_id"),
            F.concat(
                F.lit("cand-"),
                F.pmod(F.xxhash64(F.col("value"), F.lit(seed)), F.lit(n_candidates)),
            ).alias("candidate_id"),
            F.col("timestamp").alias("voting_time"),
            F.lit(1).alias("vote"),
        )
    )
