"""Scalar function library (reference inventory §2.6 F1-F9)."""

from realtime_voting_data_engineering_spark.functions.scalar import (  # noqa: F401
    dec,
    full_name,
    iso_date,
    json_decode,
    json_encode,
    now_formatted,
    party_for,
    uniform_pick,
)
