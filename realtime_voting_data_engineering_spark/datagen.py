"""Seeded, network-free synthetic data generator for the voting domain.

Replaces the reference's randomuser.me HTTP source (main.py:11,96-99,
149-151) with deterministic Spark expressions over ``spark.range(n)`` —
no driver-side loops, no Python row functions, fully distributed and
reproducible (FIXTURES.md field shapes; reference seeds random.seed(21),
main.py:26).

Every field is a pure function of the row index via xxhash64, so any
subset/scale regenerates identically — generation at 100 TB is an
embarrassingly parallel range scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_voting_data_engineering_spark.functions.scalar import (
    full_name,
    party_for,
    uniform_pick,
)

SEED = 21  # reference: random.seed(21), main.py:26

_FIRST_NAMES = (
    "Oliver", "Amelia", "George", "Isla", "Noah", "Ava", "Arthur", "Ivy",
    "Muhammad", "Freya", "Leo", "Lily", "Harry", "Elsie", "Oscar", "Mia",
)
_LAST_NAMES = (
    "Smith", "Jones", "Taylor", "Brown", "Williams", "Wilson", "Johnson",
    "Davies", "Robinson", "Wright", "Thompson", "Evans", "Walker", "White",
)
_STREETS = (
    "High Street", "Station Road", "Main Street", "Park Road", "Church Road",
    "London Road", "Victoria Road", "Green Lane", "Manor Road", "Queens Road",
)
_CITIES = (
    "London", "Manchester", "Birmingham", "Leeds", "Glasgow", "Liverpool",
    "Bristol", "Sheffield", "Edinburgh", "Cardiff",
)
_STATES = (
    "England", "Scotland", "Wales", "Northern Ireland", "Greater London",
    "West Midlands", "Merseyside", "South Yorkshire", "Lothian", "Glamorgan",
)


def _pick(idx_col, options: tuple[str, ...], salt: str):
    """Deterministic uniform pick from a literal list, keyed by row index
    and salt — compiles to array indexing, no UDF, no shuffle."""
    arr = F.array(*[F.lit(o) for o in options])
    i = F.pmod(F.xxhash64(idx_col, F.lit(salt), F.lit(SEED)), F.lit(len(options)))
    return F.element_at(arr, (i + 1).cast("int"))


def _uuid_ish(idx_col, salt: str):
    """Deterministic uuid-shaped id: md5 hex formatted 8-4-4-4-12
    (reference uses uuid.uuid4(), main.py:102,154; ours is reproducible)."""
    h = F.md5(F.concat(F.lit(salt), idx_col.cast("string"), F.lit(str(SEED))))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def generate_candidates(spark: SparkSession, n: int = 3) -> DataFrame:
    """3 candidates with alternating gender and round-robin parties
    (main.py:96,101-108; party formula F4, main.py:104)."""
    idx = F.col("id")
    return spark.range(n).select(
        _uuid_ish(idx, "cand").alias("candidate_id"),
        full_name(_pick(idx, _FIRST_NAMES, "cfn"), _pick(idx, _LAST_NAMES, "cln")).alias(
            "candidate_name"
        ),
        party_for(idx, 3).alias("party_affiliation"),
        F.lit("A brief biography").alias("biography"),
        F.lit("Key campaign promises").alias("campaign_platform"),
        F.concat(F.lit("https://example.invalid/photos/"), idx.cast("string")).alias(
            "photo_url"
        ),
    )


def generate_voters(spark: SparkSession, n: int = 1000) -> DataFrame:
    """Voters with FIXTURES.md §2 field shapes (reference generation:
    main.py:149-172), one expression per field, fully vectorized."""
    idx = F.col("id")
    dob_days = F.pmod(F.xxhash64(idx, F.lit("dob"), F.lit(SEED)), F.lit(365 * 50))
    age_base = F.pmod(F.xxhash64(idx, F.lit("age"), F.lit(SEED)), F.lit(80))
    house = F.pmod(F.xxhash64(idx, F.lit("house"), F.lit(SEED)), F.lit(300)) + 1
    return spark.range(n).select(
        # generation ordinal, not part of the canonical schema — lets the
        # event generator assign sequence numbers without a global window
        idx.alias("voter_seq"),
        _uuid_ish(idx, "voter").alias("voter_id"),
        full_name(_pick(idx, _FIRST_NAMES, "vfn"), _pick(idx, _LAST_NAMES, "vln")).alias(
            "voter_name"
        ),
        F.date_add(F.lit("1955-01-01").cast("date"), dob_days.cast("int")).alias(
            "date_of_birth"
        ),
        F.when(F.pmod(idx, 2) == 1, "female").otherwise("male").alias("gender"),
        F.lit("GB").alias("nationality"),
        _uuid_ish(idx, "reg").alias("registration_number"),
        F.concat_ws(" ", house.cast("string"), _pick(idx, _STREETS, "street")).alias(
            "address_street"
        ),
        _pick(idx, _CITIES, "city").alias("address_city"),
        _pick(idx, _STATES, "state").alias("address_state"),
        F.lit("United Kingdom").alias("address_country"),
        F.concat(
            F.lit("PC"),
            F.pmod(F.xxhash64(idx, F.lit("pc"), F.lit(SEED)), F.lit(9999)).cast("string"),
        ).alias("address_postcode"),
        F.concat(
            F.lit("voter"), idx.cast("string"), F.lit("@example.invalid")
        ).alias("email"),
        F.concat(
            F.lit("07"),
            F.lpad(
                F.pmod(F.xxhash64(idx, F.lit("ph"), F.lit(SEED)), F.lit(10**9)).cast(
                    "string"
                ),
                9,
                "0",
            ),
        ).alias("phone_number"),
        F.concat(F.lit("https://example.invalid/pics/"), idx.cast("string")).alias(
            "picture"
        ),
        (F.lit(18) + age_base.cast("int")).alias("registered_age"),
    )


def generate_vote_events(
    spark: SparkSession,
    voters: DataFrame,
    candidates: DataFrame,
    base_time: str = "2024-05-02 08:00:00",
    events_per_second: int = 2,
    late_fraction_mod: int = 0,
    late_by_seconds: int = 300,
) -> DataFrame:
    """Denormalized vote events (votes_topic payload, voting.py:69-74):
    voter ∪ assigned candidate ∪ {voting_time, vote=1}.

    - Candidate assignment is deterministic-per-voter (J1 semantics
      decision, SURVEY.md §7): ``xxhash64(voter_id, seed) mod n`` +
      broadcast join — uniform, retry/shuffle-stable.
    - ``voting_time``: monotone at ``events_per_second`` (reference
      throttle W7, voting.py:93), keyed to a stable per-voter sequence
      number so generation order is irrelevant.
    - ``late_fraction_mod``: every Nth voter's event is shifted
      ``late_by_seconds`` into the past to exercise watermarks (W1).
    """
    # Candidate ordinal: the dim is tiny by contract, so collect the sorted
    # ids once on the driver and broadcast-join the ordinal back — no
    # global window (whose empty partition spec would WARN on every run).
    cand_ids = [
        r[0] for r in candidates.select("candidate_id").orderBy("candidate_id").collect()
    ]
    n_cand = len(cand_ids)
    spark = candidates.sparkSession
    ordinals = spark.createDataFrame(
        [(cid, i) for i, cid in enumerate(cand_ids)],
        "candidate_id string, cand_idx int",
    )
    cand_idx = candidates.join(F.broadcast(ordinals), "candidate_id")
    # Voter sequence: use the generation ordinal when present (scales with
    # no shuffle); fall back to a global window only for ad-hoc inputs.
    if "voter_seq" in voters.columns:
        v = voters.withColumn("seq", F.col("voter_seq")).drop("voter_seq")
    else:
        v = voters.withColumn(
            "seq", F.row_number().over(Window.orderBy("voter_id")) - 1
        )
    v = v.withColumn("cand_idx", uniform_pick("voter_id", n_cand, SEED))
    interval_us = int(1_000_000 / events_per_second)
    ts = F.timestamp_micros(
        F.unix_micros(F.lit(base_time).cast("timestamp"))
        + F.col("seq").cast("bigint") * interval_us
    )
    if late_fraction_mod:
        ts = F.when(
            F.pmod(F.col("seq"), F.lit(late_fraction_mod)) == 0,
            F.timestamp_micros(F.unix_micros(ts) - late_by_seconds * 1_000_000),
        ).otherwise(ts)
    joined = v.join(F.broadcast(cand_idx), "cand_idx")
    voter_cols = [c for c in voters.columns if c not in ("email", "voter_seq")]
    cand_cols = [c for c in candidates.columns]
    return joined.select(
        *voter_cols,
        *cand_cols,
        ts.alias("voting_time"),
        F.lit(1).alias("vote"),
    )


def vote_events_as_json(events: DataFrame) -> DataFrame:
    """Kafka-wire shape (S3, main.py:222-227 / voting.py:85-90): key =
    voter_id, value = JSON document of the full record."""
    return events.select(
        F.col("voter_id").alias("key"),
        F.to_json(F.struct(*events.columns)).alias("value"),
    )
