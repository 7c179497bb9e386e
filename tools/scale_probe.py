"""Scale probe: measure how the engine's key operators ACTUALLY scale
when the data grows, instead of arguing it from plan shapes alone.

The driver corpus is fixed at sf0.1 locally, so this harness builds
replicated corpora under /tmp and times the operators at 1x/4x/16x:

- **Relational** (q1-shape aggregate; q18-shape semi-join + agg) over
  replicated ``lineitem`` with SHIFTED order keys, so group cardinality
  grows with the data — the honest "corpus got K times bigger" regime.
  Expectation: ~linear wall time (scan-bound, partial agg before one
  exchange).
- **Dedup, corpus-growth regime** over ``documents`` where every
  replica's tokens get a replica-unique suffix — replicas share NO
  shingles, so the near-dup rate per doc stays constant while the
  corpus grows K times. Expectation: ~linear (signatures are per-row,
  banding is an equi-join, verified pairs grow Kx).
- **Dedup, duplicate-explosion regime** over ``documents`` replicated
  VERBATIM — every doc gains K-1 exact copies, so verified pairs grow
  ~K^2 per cluster (C(K,2) within each replica family). This is the
  worst case LSH can face (the corpus is one giant duplicate farm).
  Expectation: wall time tracks EMITTED PAIR COUNT, not corpus^2 —
  cost per verified pair stays ~flat, because banding only ever joins
  within buckets and verification touches candidate pairs only.
- **Connected components** on each regime's pair graph: rounds must
  stay O(diameter) (near-dup clusters are shallow no matter how many
  members they have), so CC time grows with edge volume, not rounds.

``--family emb`` probes the embedding/ANN family the same way
(VERDICT r6 #7's measured-not-argued standard, embedding side):

- **SRP candidate gen + cosine verify** over ``embeddings`` replicated
  with shifted vec_ids, in the same two regimes: ``lin`` circular-shifts
  each replica's components (replicas decorrelate: shifted near-uniform
  vectors have ~0 expected cosine) and ``dupfarm`` copies vectors
  VERBATIM (every vector gains K-1 exact dups — identical signatures
  collide in EVERY band, the LSH worst case). The probe sizes bits-per-
  band as ceil(log2(N)) exactly as a real deployment must: this corpus
  is near-uniform (the hardest case for LSH — no cluster structure to
  prune on), so at FIXED banding the random-collision pair count is
  ~N^2 * 2^-r * bands; growing r logarithmically holds expected random
  candidates ~linear in N. Expectation: lin candidates ~linear under
  log-scaled r; dupfarm wall time tracks EMITTED pairs (~K^2 per dup
  family), never corpus^2.
- **IVF probe-path top-k / PQ encode / int8-quantized top-k** over the
  lin corpus: all corpus-linear by plan shape (assign scan, Arrow
  kernel, int8 scan) — the probe checks the wall clock agrees.

Run: ``python tools/scale_probe.py [--sf-dir DIR] [--factors 1,4,16]
[--family text|emb|all]``
Prints one JSON line per (operator, factor) with wall seconds and the
relevant output cardinality, then a summary of measured growth ratios.
Results are recorded in SCALE.md ("Round-6 measured scaling"). This is
a diagnostic tool, not part of the driver contract or the bench.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

# Size the single local JVM for the 16x corpora BEFORE it launches (the
# default 1g driver heap OOMs on the duplicate-explosion regime; on a
# real cluster this is per-executor memory, set by the deployment).
os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS", "--driver-memory 24g pyspark-shell"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_voting_data_engineering_spark.operators import dedup as D
from realtime_voting_data_engineering_spark.operators import similarity as S
from realtime_voting_data_engineering_spark.session import get_spark
from realtime_voting_data_engineering_spark.sources.tables import load_table

WORKDIR = "/tmp/rtv_scale_probe"
EMB_DIMS = 64  # the corpus's declared dimensionality (TESTDATA.md)


def replicate_lineitem(li: DataFrame, k: int) -> DataFrame:
    """K copies with shifted order/part/supp keys: key cardinality grows
    with the data, as it would in a genuinely bigger corpus."""
    if k == 1:
        return li
    max_ok = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    rep = li.crossJoin(F.broadcast(
        SparkSession.getActiveSession().range(k).toDF("__r")))
    return rep.select(
        (F.col("l_orderkey") + F.col("__r") * F.lit(max_ok)).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    )


def replicate_docs(docs: DataFrame, k: int, decorrelate: bool) -> DataFrame:
    """K copies with shifted doc_ids. ``decorrelate=True`` suffixes every
    token with the replica index so replicas share no shingles (constant
    dup-rate regime); ``False`` keeps text verbatim (duplicate farm)."""
    if k == 1:
        return docs
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    rep = docs.crossJoin(F.broadcast(
        SparkSession.getActiveSession().range(k).toDF("__r")))
    text = F.col("text")
    if decorrelate:
        text = F.array_join(
            F.transform(
                F.split(F.col("text"), r"\s+"),
                lambda t: F.concat(t, F.lit("x"), F.col("__r").cast("string")),
            ),
            " ",
        )
    return rep.select(
        (F.col("doc_id") + F.col("__r") * F.lit(max_id)).alias("doc_id"),
        text.alias("text"),
    )


def replicate_embeddings(emb: DataFrame, k: int, decorrelate: bool) -> DataFrame:
    """K copies with shifted vec_ids. ``decorrelate=True`` circularly
    shifts each replica's components by a replica-unique offset
    (norm-preserving; shifted near-uniform vectors have ~0 expected
    cosine, so replicas are NOT near-dups of each other — the honest
    "corpus got K times bigger" regime); ``False`` copies vectors
    verbatim (duplicate farm: K-1 exact dups per vector, identical SRP
    signatures, the banding worst case)."""
    if k == 1:
        return emb
    max_id = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    rep = emb.crossJoin(F.broadcast(
        SparkSession.getActiveSession().range(k).toDF("__r")))
    vec = F.col("embedding")
    if decorrelate:
        # offset 7 is coprime with 64 → all k ≤ 64 replicas get distinct
        # rotations; slice is 1-based, length-0 slice is the empty array.
        s = F.pmod(F.col("__r") * F.lit(7), F.lit(EMB_DIMS)).cast("int")
        vec = F.concat(
            F.slice(vec, s + F.lit(1), F.lit(EMB_DIMS) - s),
            F.slice(vec, F.lit(1), s),
        )
    return rep.select(
        (F.col("vec_id") + F.col("__r") * F.lit(max_id)).alias("vec_id"),
        vec.alias("embedding"),
    )


def materialize(df: DataFrame, path: str) -> str:
    df.write.mode("overwrite").parquet(path)
    return path


def timed(fn, *, runs: int = 2):
    best, out = None, None
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        elapsed = time.perf_counter() - t0
        best = elapsed if best is None else min(best, elapsed)
    return best, out


def probe(sf_dir: str, factors: list[int]) -> list[dict]:
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(WORKDIR, exist_ok=True)
    results: list[dict] = []

    def record(op: str, k: int, sec: float, n: int):
        row = {"op": op, "k": k, "sec": round(sec, 3), "rows": n}
        results.append(row)
        print(json.dumps(row), flush=True)

    li_base = load_table(spark, sf_dir, "lineitem")
    docs_base = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    for k in factors:
        li_path = os.path.join(WORKDIR, f"lineitem_x{k}")
        materialize(replicate_lineitem(li_base, k), li_path)
        li = spark.read.parquet(li_path)

        # q1-shape: scan + partial agg + one exchange on tiny key space.
        def q1_shape():
            return (
                li.filter(F.col("l_shipdate") < F.lit("2098-09-01"))
                .groupBy("l_returnflag", "l_linestatus")
                .agg(
                    F.sum("l_quantity").alias("sum_qty"),
                    F.avg("l_extendedprice").alias("avg_price"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )

        sec, out = timed(q1_shape)
        record("q1_shape_agg", k, sec, len(out))

        # q18-shape: self-aggregate -> semi join -> re-aggregate.
        def q18_shape():
            big = (
                li.groupBy("l_orderkey")
                .agg(F.sum("l_quantity").alias("qty"))
                .filter(F.col("qty") > 150)
            )
            return (
                li.join(big.select("l_orderkey"), "l_orderkey", "left_semi")
                .groupBy("l_orderkey")
                .agg(F.sum("l_quantity").alias("sum_qty"))
                .count()
            )

        sec, out = timed(q18_shape)
        record("q18_shape_semijoin", k, sec, out)

        for regime, decorrelate in (("lin", True), ("dupfarm", False)):
            d_path = os.path.join(WORKDIR, f"docs_{regime}_x{k}")
            materialize(replicate_docs(docs_base, k, decorrelate), d_path)
            docs = spark.read.parquet(d_path)

            def pairs_fn():
                return D.minhash_dedup_pairs(
                    docs, num_hashes=16, bands=4, threshold=0.5
                ).localCheckpoint()

            sec, pairs = timed(pairs_fn, runs=1)
            n_pairs = pairs.count()
            record(f"minhash_pairs_{regime}", k, sec, n_pairs)

            sec, cc = timed(lambda: D.connected_components(pairs), runs=1)
            record(f"cc_{regime}", k, sec, cc.count())

    shutil.rmtree(WORKDIR, ignore_errors=True)
    return results


def probe_emb(sf_dir: str, factors: list[int]) -> list[dict]:
    import math

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(WORKDIR, exist_ok=True)
    results: list[dict] = []

    def record(op: str, k: int, sec: float, n: int, **extra):
        row = {"op": op, "k": k, "sec": round(sec, 3), "rows": n, **extra}
        results.append(row)
        print(json.dumps(row), flush=True)

    emb_base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    # Queries stay FIXED as the corpus grows (the serving contract: |Q|
    # small, corpus huge) — scaling should show corpus-linear cost.
    queries = emb_base.filter(F.col("vec_id") < 10).limit(10)

    for k in factors:
        for regime, decorrelate in (("lin", True), ("dupfarm", False)):
            e_path = os.path.join(WORKDIR, f"emb_{regime}_x{k}")
            materialize(replicate_embeddings(emb_base, k, decorrelate), e_path)
            emb = spark.read.parquet(e_path)
            n = emb.count()

            # Deployment-honest banding: bits-per-band r = ceil(log2 N)
            # holds EXPECTED random-collision candidates ~linear in N on
            # clusterless (near-uniform) data; 3 bands keeps planes = 3r
            # under with_srp_signature's 62-bit signature pack.
            r_bits = min(20, max(8, math.ceil(math.log2(max(n, 2)))))
            bands = 3
            planes = bands * r_bits

            def cands_fn():
                return S.srp_candidate_pairs(
                    emb, EMB_DIMS, planes=planes, bands=bands
                ).localCheckpoint()

            sec, cands = timed(cands_fn, runs=1)
            n_cand = cands.count()
            record(f"srp_cands_{regime}", k, sec, n_cand, planes=planes)

            a = emb.select(F.col("vec_id").alias("id_a"),
                           F.col("embedding").alias("va"))
            b = emb.select(F.col("vec_id").alias("id_b"),
                           F.col("embedding").alias("vb"))

            def verify_fn():
                return (
                    cands.join(a, "id_a").join(b, "id_b")
                    .filter(
                        F.round(S.cosine(F.col("va"), F.col("vb")), 6)
                        >= 0.4
                    )
                    .count()
                )

            sec, n_ver = timed(verify_fn, runs=1)
            record(f"srp_verify_{regime}", k, sec, n_ver)

            if regime != "lin":
                continue
            # Corpus-linear serving paths, lin regime only (a dup farm
            # changes WHICH rows fill the cells, not the plan shape).
            sec, out = timed(
                lambda: S.unique_by_id(emb, dims=EMB_DIMS).count()
            )
            record("uniq_boundary", k, sec, out)
            sec, out = timed(
                lambda: S.knn_ivf_fixed(queries, emb, EMB_DIMS).count()
            )
            record("ivf_topk", k, sec, out)
            sec, out = timed(lambda: S.pq_encode(emb, EMB_DIMS).count())
            record("pq_encode", k, sec, out)
            sec, out = timed(lambda: S.knn_quantized(queries, emb).count())
            record("knn_quantized", k, sec, out)

    shutil.rmtree(WORKDIR, ignore_errors=True)
    return results


def summarize(results: list[dict]) -> None:
    by_op: dict[str, dict[int, dict]] = {}
    for r in results:
        by_op.setdefault(r["op"], {})[r["k"]] = r
    print("\n# growth summary (k: sec_ratio vs x1 / rows_ratio vs x1)")
    for op, rows in by_op.items():
        base = rows.get(1)
        if not base:
            continue
        parts = []
        for k in sorted(rows):
            if k == 1:
                continue
            sr = rows[k]["sec"] / max(base["sec"], 1e-9)
            rr = rows[k]["rows"] / max(base["rows"], 1)
            parts.append(f"x{k}: {sr:.1f}x sec / {rr:.1f}x rows")
        print(f"{op:26s} {'; '.join(parts)}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--factors", default="1,4,16")
    ap.add_argument(
        "--family", default="text", choices=("text", "emb", "all")
    )
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]
    results: list[dict] = []
    if args.family in ("text", "all"):
        results += probe(args.sf_dir, factors)
    if args.family in ("emb", "all"):
        results += probe_emb(args.sf_dir, factors)
    summarize(results)
