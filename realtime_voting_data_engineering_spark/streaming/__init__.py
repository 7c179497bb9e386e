"""Structured Streaming layer: the reference's streaming semantics
(spark_stream.py) as composable, source-agnostic transformations."""

from realtime_voting_data_engineering_spark.streaming.pipeline import (  # noqa: F401
    compact_latest_per_key,
    dedup_votes,
    parse_vote_stream,
    start_update_aggregate,
    turnout_per_location_stream,
    votes_per_candidate_stream,
    windowed_votes_stream,
)
