"""Kafka adapters: availability gating behaves cleanly when the
connector jar is absent (this environment)."""

from __future__ import annotations

import pytest

from realtime_voting_data_engineering_spark.sources import kafka as K


def test_kafka_not_available_here(spark):
    assert K.kafka_available(spark) is False


def test_read_stream_raises_clear_error(spark):
    with pytest.raises(K.KafkaUnavailableError):
        K.read_stream(spark, "localhost:9092", "votes_topic")


def test_write_batch_raises_clear_error(spark, sf_smoke):
    from realtime_voting_data_engineering_spark.sources.tables import load_table

    df = load_table(spark, sf_smoke, "nation")
    with pytest.raises(K.KafkaUnavailableError):
        K.write_batch(df, "localhost:9092", "nation_topic", key_col="n_nationkey")
