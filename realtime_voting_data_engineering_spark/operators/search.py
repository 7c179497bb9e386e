"""Full-text relevance search over document tables: BM25 scoring and
top-k retrieval — the keyword-search leg of a training-data pipeline
(quality filtering by topicality, targeted corpus slicing) next to the
embedding-based similarity in ``operators.similarity``.

Design: for a FIXED small query-term set the whole score is expressible
as per-row codegen expressions — per-term ``tf`` via array filters (no
explode, no per-token shuffle). The tf + doc-length projection is
computed ONCE (persisted, disk-backed — it is id + a few ints, orders
of magnitude smaller than the corpus it summarizes): a first job folds
it into the 1-row corpus stats (``N``, ``df_t``, ``avgdl``), which are
inlined as LITERALS into the scoring pass over the same persisted
projection — so a 100 TB corpus is scanned (and tokenized) exactly
once, there is no join at all, and the top-k is a TakeOrdered (no full
sort). The classic inverted-index formulation shuffles every
(term, doc) posting; this shape moves the (tiny) query to the data
instead.

Determinism contract: the BM25 idf here is the *rational* Robertson
variant ``(N - df + 0.5) / (df + 0.5)`` — NO logarithm — so every term's
contribution is a fixed-order chain of +,-,*,/ on doubles that DuckDB
replays bit-for-bit (the repo-wide no-libm oracle rule, see
``operators.text`` module docstring).

Reference parity: the reference has no text search; this extends its
dashboard lookup surface (streamlit-app.py:96 argmax) to ranked
retrieval, per the training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtime_voting_data_engineering_spark.operators.text import tokens


def term_tf(text: Column | str, term: str) -> Column:
    """Occurrences of ``term`` among lowercase whitespace tokens — an
    array filter over the token split, no explode."""
    toks = tokens(text)
    return F.size(F.filter(toks, lambda t: F.lower(t) == F.lit(term)))


def bm25_score(
    tf_cols: list[tuple[Column, Column]],
    dl: Column,
    avgdl: Column,
    k1: float = 1.2,
    b: float = 0.75,
) -> Column:
    """BM25 with rational idf, summed over terms in list order (fixed
    association so the oracle's ``+`` chain matches bit-for-bit).

    ``tf_cols`` pairs each term's tf column with its idf column.
    """
    norm = F.lit(1.0) - F.lit(b) + F.lit(b) * dl / avgdl
    score = F.lit(0.0)
    for tf, idf in tf_cols:
        tfd = tf.cast("double")
        score = score + idf * (tfd * F.lit(k1 + 1.0)) / (tfd + F.lit(k1) * norm)
    return score


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 relevance to ``query_terms``.

    Thin wrapper over :func:`bm25_topk_indexed` that drops the index
    handle — and therefore builds UNPERSISTED (``persist=False``): a
    caller that cannot unpersist must not persist, or every direct call
    (audit tools, ad-hoc queries) leaks a session-lifetime DISK_ONLY
    cache entry (r8 advice). The price is a second corpus scan (stats
    job + scoring pass); callers that own the cache lifecycle (the
    ``bm25_search_topk`` memo) use the indexed form directly and pay the
    persist exactly once per corpus.
    """
    return bm25_topk_indexed(
        docs, query_terms, k, k1, b, text_col, id_col, persist=False
    )[0]


def bm25_topk_indexed(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_salt: str | None = None,
    persist: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Top-k documents by BM25 relevance, plus the persisted index.

    ``persist=False`` skips caching the tf projection entirely: the
    corpus is scanned twice (once for the stats fold, once for scoring)
    and NO CacheManager entry is created. This is the mode for callers
    that cannot own an unpersist (the :func:`bm25_topk` wrapper) and for
    content-unverifiable corpora (``bm25_search_topk``'s ``token is
    None`` path) — a persisted-but-unowned plan is a session-lifetime
    leak, and worse, an identical analyzed plan from a LATER call
    plan-dedupes onto the live stale entry and silently serves old rows
    (r8 advice). Double scan over no invalidation story.

    Snapshot caveat of the double scan: the stats fold (scan 1, eager)
    and the scoring pass (scan 2, at the caller's action) read the
    corpus at DIFFERENT times, so a concurrent in-place rewrite can mix
    old-corpus idf literals with new-corpus tf — a score consistent
    with neither snapshot. This is accepted for this mode: persist=False
    exists precisely for corpora whose content cannot be verified or
    invalidated, where best-effort freshness beats an un-invalidatable
    cache (and the persisted path races the same rewrite at BUILD time
    — one snapshot, but just as arbitrarily placed). Callers needing
    read consistency under concurrent rewrites need a snapshotting
    table format underneath, not a flag here.

    ``cache_salt`` gives the persisted index a CONTENT-keyed cache
    identity: Spark's CacheManager dedupes persists by analyzed plan,
    and a plan built from a path is identical across in-place corpus
    rewrites — so without a salt, a rebuild for NEW content can dedupe
    onto a live STALE entry (its eager stats job then reads old rows),
    and unpersisting an evicted entry can uncache another build's
    index. A literal column derived from the caller's content token
    makes plans for different contents structurally distinct, closing
    the whole class; cache owners (the ``bm25_search_topk`` memo) pass
    their token here.

    Returns ``(topk, projection)`` where ``projection`` is the persisted
    tf + doc-length frame (the index) — the handle cache owners need to
    ``unpersist`` when the corpus the index was built from is rewritten.
    An explicit pair instead of a dynamic attribute on the result frame
    (r7 advice): attributes bolted onto a DataFrame silently vanish
    under any wrapping transformation, so the ownership contract lived
    one ``.select`` away from breaking.

    Plan shape (pinned in tests/test_plans.py): the tf + doc-length
    projection is PERSISTED (disk-backed — at 100 TB it is ~tens of
    bytes/doc vs the corpus's documents), an eager first job folds it to
    the 1-row corpus stats (the one deliberate driver-side collect here
    — a single row by construction, like the |Q|-bounded collects in
    ``operators.similarity``), and the stats are inlined as literals
    into the scoring pass over the same persisted projection. The
    corpus parquet is scanned and tokenized exactly ONCE; there is no
    join; zero data-sized shuffles; the top-k is a TakeOrdered. The
    persisted projection stays registered for the DataFrame's lifetime
    (Spark's cache manager dedupes re-persists of the same plan).

    Stats become literals, so the idf arithmetic is bit-identical to
    the former broadcast-join form — same values, same oracle.
    """
    from pyspark.storagelevel import StorageLevel

    tf_aliases = [f"__tf_{i}" for i in range(len(query_terms))]
    base = docs.select(
        F.col(id_col),
        *[term_tf(text_col, t).alias(a) for t, a in zip(query_terms, tf_aliases)],
        F.size(tokens(text_col)).alias("__dl"),
    )
    if cache_salt is not None:
        base = base.withColumn("__cache_salt", F.lit(cache_salt))
    if persist:
        base = base.persist(StorageLevel.DISK_ONLY)
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg(F.col("__dl").cast("double")).alias("__avgdl"),
        *[
            F.sum((F.col(a) > 0).cast("bigint")).cast("double").alias(f"__df_{i}")
            for i, a in enumerate(tf_aliases)
        ],
    ).collect()[0]
    # SUM/AVG over an EMPTY corpus are NULL — fold them to 0.0 so an
    # empty feed scores nothing instead of crashing the literal build.
    n_docs = F.lit(float(stats["__n"]))
    avgdl = F.lit(float(stats["__avgdl"] or 0.0))
    half = F.lit(0.5)
    tf_idf_pairs = [
        (
            F.col(a),
            (n_docs - F.lit(float(stats[f"__df_{i}"] or 0.0)) + half)
            / (F.lit(float(stats[f"__df_{i}"] or 0.0)) + half),
        )
        for i, a in enumerate(tf_aliases)
    ]
    scored = base.select(
        F.col(id_col),
        F.round(
            bm25_score(tf_idf_pairs, F.col("__dl").cast("double"), avgdl, k1, b),
            6,
        ).alias("score"),
    ).filter(F.col("score") > 0)
    out = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    return out, base
