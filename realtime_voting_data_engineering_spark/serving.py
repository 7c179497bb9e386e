"""Serving views: the dashboard's query surface (streamlit-app.py) as
engine functions over a *compacted* results table — fixing the
reference's pattern of re-reading the whole update log from Kafka and
aggregating duplicates in pandas (streamlit-app.py:14,91-96, SURVEY W5).

Inputs are latest-per-key totals (from ``streaming.pipeline.
foreach_batch_upsert`` or ``compact_latest_per_key``); every view is a
bounded DataFrame the dashboard can ``toPandas()`` at the very edge —
group-cardinality rows, never raw events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtime_voting_data_engineering_spark.operators import relational as R


def leading_candidate(totals: DataFrame, value: str = "total_votes") -> DataFrame:
    """A4/T1 (streamlit-app.py:96): argmax row, deterministic via the
    candidate_id tiebreak."""
    return R.top_k(totals, [F.col(value).desc(), F.col("candidate_id")], k=1)


def results_with_share(
    totals: DataFrame, value: str = "total_votes"
) -> DataFrame:
    """A5 (streamlit-app.py:61): per-candidate share of the total, over
    the already-aggregated frame."""
    return R.share_of_total(totals, value)


def results_page(
    totals: DataFrame,
    sort_col: str,
    ascending: bool,
    page: int,
    page_size: int,
    key: str = "candidate_id",
) -> DataFrame:
    """T2/T3 (streamlit-app.py:70-77): user-chosen sort column/direction
    plus a page slice, total-ordered by the unique key."""
    order: list[Column] = [
        F.col(sort_col).asc() if ascending else F.col(sort_col).desc(),
        F.col(key),
    ]
    return R.paginate(totals, order, page, page_size)


def header_counts(
    voters: DataFrame, candidates: DataFrame, votes: DataFrame
) -> DataFrame:
    """A3 (streamlit-app.py:27-31): the dashboard's scalar header row."""
    return R.scalar_counts(
        {
            "total_voters": voters,
            "total_candidates": candidates,
            "total_votes": votes,
        }
    )


def turnout_by_location(
    location_totals: DataFrame, top_n: int = 10
) -> DataFrame:
    """A2-backed map/table view: top locations by turnout."""
    return R.top_k(
        location_totals,
        [F.col("total_voters").desc(), F.col("address_state")],
        k=top_n,
    )
