"""End-to-end: the reference's whole pipeline, rebuilt — seed → wire →
streaming parse/dedup → fan-out aggregates (per-candidate + per-location)
→ idempotent serving upsert → dashboard views — on file sources, with
every stage's output checked against batch truth. A user of the reference
runs exactly this flow, minus Kafka-for-files and with the reference's
bugs (update-log dashboard, poisoned PK transactions, at-least-once
re-reads) fixed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_voting_data_engineering_spark import datagen as G
from realtime_voting_data_engineering_spark import schemas as SCH
from realtime_voting_data_engineering_spark.operators import relational as R
from realtime_voting_data_engineering_spark.streaming import pipeline as P


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    candidates = G.generate_candidates(spark, 3)
    voters = G.generate_voters(spark, 500)
    events = G.generate_vote_events(spark, voters, candidates).cache()
    # at-least-once wire: 20% of events delivered twice
    dup = events.filter(F.pmod(F.xxhash64("voter_id"), F.lit(5)) == 0)
    wire = events.unionByName(dup)
    G.vote_events_as_json(wire).write.mode("overwrite").json(str(root / "wire"))
    return {"root": root, "candidates": candidates, "events": events}


def test_full_pipeline(spark, world, tmp_path):
    root = world["root"]
    events = world["events"]

    raw = spark.readStream.schema("key STRING, value STRING").json(
        str(root / "wire")
    )
    parsed = P.parse_vote_stream(raw, SCH.vote_event_schema())
    deduped = P.dedup_votes(parsed)  # W6: collapse the duplicated deliveries

    # W4 fan-out: two aggregates off one deduped stream
    per_cand = P.votes_per_candidate_stream(deduped, watermark=None)
    per_loc = P.turnout_per_location_stream(deduped, watermark=None)
    q1 = P.start_update_aggregate(per_cand, "e2e_cand", str(tmp_path / "c1"))
    q2 = P.start_update_aggregate(per_loc, "e2e_loc", str(tmp_path / "c2"))
    q1.awaitTermination(180)
    q2.awaitTermination(180)

    # The memory sink holds the update *log* (W2); serving needs W5
    # compaction — here via the latest-total-per-key view.
    cand_totals = spark.sql(
        "SELECT candidate_id, candidate_name, max(total_votes) AS total_votes "
        "FROM e2e_cand GROUP BY candidate_id, candidate_name"
    )
    loc_totals = spark.sql(
        "SELECT address_state, max(total_voters) AS total_voters "
        "FROM e2e_loc GROUP BY address_state"
    )

    # Batch truth from the original (non-duplicated) events
    expected_cand = {
        r.candidate_id: r.t
        for r in events.groupBy("candidate_id").agg(F.sum("vote").alias("t")).collect()
    }
    expected_loc = {
        r.address_state: r.n
        for r in events.groupBy("address_state").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r.candidate_id: r.total_votes for r in cand_totals.collect()} == expected_cand
    assert {r.address_state: r.total_voters for r in loc_totals.collect()} == expected_loc

    # Dashboard views (A4 leading candidate, A5 shares, A3 counts)
    leading = R.top_k(
        cand_totals, [F.col("total_votes").desc(), F.col("candidate_id")], k=1
    ).collect()[0]
    assert leading.total_votes == max(expected_cand.values())
    shares = R.share_of_total(cand_totals, "total_votes").collect()
    assert abs(sum(r.share_pct for r in shares) - 100.0) < 0.05
    counts = R.scalar_counts(
        {"total_votes": cand_totals.agg(F.sum("total_votes").alias("v"))}
    )
    assert counts.columns == ["total_votes"]

    # Serving: idempotent foreachBatch upsert — replay must be a no-op
    target = str(tmp_path / "serving")
    upsert = P.foreach_batch_upsert(target, ["candidate_id"], "total_votes")
    batch = cand_totals.select("candidate_id", "total_votes")
    upsert(batch, 1)
    upsert(batch, 1)
    served = {
        r.candidate_id: r.total_votes for r in spark.read.parquet(target).collect()
    }
    assert served == expected_cand


def test_results_page_matches_pandas_oracle_over_grid(spark):
    """T2/T3 parity grid: results_page must equal the reference
    dashboard's exact pandas semantics (sort_values then
    iloc[(page-1)*size : page*size], streamlit-app.py:70-77) for every
    (direction, page size, page) combination — including ties on the
    sort column (broken by the unique key) and pages past the end."""
    import pandas as pd

    from realtime_voting_data_engineering_spark import serving as V

    # 23 rows with heavy ties on the sort column to stress tiebreaks.
    rows = [(f"cand-{i:02d}", i % 5) for i in range(23)]
    totals = spark.createDataFrame(rows, "candidate_id string, total_votes int")
    oracle = pd.DataFrame(rows, columns=["candidate_id", "total_votes"])

    for ascending in (True, False):
        expected_full = oracle.sort_values(
            ["total_votes", "candidate_id"], ascending=[ascending, True]
        ).reset_index(drop=True)
        for page_size in (1, 3, 7, 50):
            n_pages = (len(rows) + page_size - 1) // page_size
            for page in range(1, n_pages + 2):  # +1: one page past the end
                got = [
                    (r.candidate_id, r.total_votes)
                    for r in V.results_page(
                        totals, "total_votes", ascending, page, page_size
                    ).collect()
                ]
                exp = list(
                    expected_full.iloc[
                        (page - 1) * page_size : page * page_size
                    ].itertuples(index=False, name=None)
                )
                assert got == exp, (
                    f"asc={ascending} size={page_size} page={page}: "
                    f"{got} != {exp}"
                )


def test_serving_views(spark, world):
    from realtime_voting_data_engineering_spark import serving as V

    events = world["events"]
    totals = events.groupBy("candidate_id", "candidate_name").agg(
        F.sum("vote").alias("total_votes")
    )
    lead = V.leading_candidate(totals).collect()
    assert len(lead) == 1
    expected_max = max(r.total_votes for r in totals.collect())
    assert lead[0].total_votes == expected_max

    shares = V.results_with_share(totals).collect()
    assert abs(sum(r.share_pct for r in shares) - 100.0) < 0.05

    page = V.results_page(totals, "total_votes", ascending=False, page=1, page_size=2)
    rows = page.collect()
    assert len(rows) == 2 and rows[0].total_votes >= rows[1].total_votes

    loc_totals = events.groupBy("address_state").agg(
        F.count(F.lit(1)).alias("total_voters")
    )
    top_locs = V.turnout_by_location(loc_totals, top_n=3).collect()
    assert len(top_locs) == 3
    assert top_locs[0].total_voters >= top_locs[-1].total_voters

    counts = V.header_counts(
        events.select("voter_id").distinct(),
        events.select("candidate_id").distinct(),
        events,
    ).collect()[0]
    assert counts.total_voters == 500
    assert counts.total_candidates == 3
    assert counts.total_votes == 500
