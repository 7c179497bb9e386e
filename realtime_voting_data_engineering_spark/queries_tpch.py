"""TPC-H-shaped relational breadth beyond q1/q3/q5: the remaining classic
query shapes expressible over the driver corpus — EXISTS/IN subqueries,
conditional aggregation, disjunctive pushdown, HAVING-on-aggregate,
correlated per-group thresholds, argmax-by-aggregate, and multi-year join
volume. The corpus lacks ``partsupp``, ``l_commitdate``/``l_receiptdate``
and ``l_shipmode``, so each query adapts its classic predicate to the
columns that exist while keeping the *plan shape* (and therefore the
scale behavior) of the original.

Determinism follows the queries.py contract: double sums go through exact
DECIMAL accumulation and a final cast back to DOUBLE; divisions happen
once, on the already-deterministic operands; top-k always carries a
unique tiebreaker.

Imported for its registration side effects by
``realtime_voting_data_engineering_spark.queries``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_voting_data_engineering_spark.functions.scalar import dec
from realtime_voting_data_engineering_spark.queries import (
    _REVENUE_SQL,
    _revenue_expr,
    _sum_dec_double,
    register,
)
from realtime_voting_data_engineering_spark.sources.tables import (
    load_table,
    widen_small_scan,
)


def _ts(lit: str):
    return F.lit(f"{lit} 00:00:00").cast("timestamp")


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "tpch", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, the canonical predicate
    pushdown showcase. All three predicates and the 4-column projection
    reach the parquet reader (PushedFilters in .explain); at 100 TB this
    is an embarrassingly parallel scan with a 1-row result."""
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        F.sum(dec(F.col("l_extendedprice") * F.col("l_discount"), 18, 6))
        .cast("double")
        .alias("revenue")
    )


@register(
    "q4_late_ship_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "tpch"),
)
def q4_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join (the corpus
    has no commit/receipt dates, so "late" = shipped >60 days after the
    order date). The semi join shuffles only the order keys that survive
    the quarter filter; lineitem's date predicate is evaluated join-side
    because it references both tables."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q7_nation_volume",
    f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {_REVENUE_SQL} AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey  = l_orderkey
    JOIN customer ON c_custkey   = o_custkey
    JOIN supplier ON s_suppkey   = l_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "tpch"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year. The two nation dims broadcast (fixed 25 rows); supplier scales
    1:100 with lineitem, so its join strategy is left to Catalyst/AQE —
    an explicit hint would OOM at 100× (it broadcasts at test SF anyway).
    The cross-nation disjunction is applied after both joins (it
    references both sides)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(_revenue_expr())


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, {_REVENUE_SQL} AS revenue, n_name, c_mktsegment
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue-per-customer over returned items,
    top 20. The returnflag and quarter filters push to the scans; nation
    broadcasts; the final top-20 is TakeOrderedAndProject."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    grouped = joined.groupBy("c_custkey", "c_name", "n_name", "c_mktsegment").agg(
        _revenue_expr()
    )
    return (
        grouped.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name", "c_mktsegment")
    )


@register(
    "q12_priority_lines",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
    tags=("join", "agg", "tpch"),
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation (CASE inside SUM) after a
    fact-fact join — the corpus has no l_shipmode, so lines group by
    returnflag instead. Both counts compute in one aggregate pass."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = orders.join(li, orders.o_orderkey == li.l_orderkey)
    return joined.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "q14_promo_revenue",
    """
    SELECT 100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
               ELSE CAST(0 AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE)
           / CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    tags=("join", "agg", "tpch"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — a conditional-sum ratio in
    one aggregate over a month of lineitem joined to part. Both decimal
    sums are exact, so the final double division is deterministic. part
    scales 1:30 with lineitem — join strategy left to Catalyst/AQE."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-03-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    part = load_table(spark, sf_dir, "part")
    disc = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 18, 6)
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            100.0 * F.sum(promo).cast("double") / F.sum(disc).cast("double")
        ).alias("promo_revenue_pct")
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {_REVENUE_SQL} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax over an aggregate (top supplier by quarter
    revenue). The scalar max is a window over the already tiny aggregated
    frame — no second scan of lineitem, unlike the naive subquery plan.
    Equality on the double is engine-stable because both sides derive
    from the same exact decimal sum."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 18, 6))
        .cast("double")
        .alias("total_revenue")
    )
    top = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.join(
        F.broadcast(top), supplier.s_suppkey == top.supplier_no
    ).select("s_suppkey", "s_name", "total_revenue")


@register(
    "q17_small_qty_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / 7.0
               AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * (CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                      / count(*))
        FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    tags=("join", "subquery", "tpch"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue with a correlated
    per-part average. Decorrelated as a WINDOW over l_partkey (r9): the
    per-part threshold rides the same shuffle that delivers the rows, so
    lineitem — the dominant table at 100 TB — is scanned ONCE (the r1-r8
    grouped-pass-plus-self-join shape scanned it twice; ReuseExchange
    can't merge a partial-agg exchange with a raw-row one, the q18
    lesson). Same arithmetic, same decimal sum, row-identical on clean
    and duplicate-row corpora; measured 0.81-0.84 → 0.69-0.74 s at sf0.1
    (interleaved min-of-3). The threshold must be computed over ALL of
    a part's lineitems (the oracle's correlated subquery ignores the
    brand filter), so the window runs BEFORE the part join; NULL
    partkeys form one window partition both ways and are then dropped
    identically by the inner part join. The brand-filtered part side
    scales with SF, so join strategy stays with AQE."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    w = Window.partitionBy("l_partkey")
    li2 = li.withColumn(
        "__thr",
        0.2
        * (
            F.sum(dec("l_quantity")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ),
    )
    small = li2.filter(F.col("l_quantity") < F.col("__thr")).join(
        part, li2.l_partkey == part.p_partkey
    )
    return small.agg(
        (F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly")
    )


@register(
    "q18_large_orders",
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    headline=True,
    tags=("join", "semi", "agg", "tpch"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — IN over a HAVING-filtered
    aggregate. The textbook decorrelation (r1-r8 here, and what the
    oracle SQL literally says) semi-joins the qualifying keys back and
    re-aggregates the re-joined lineitem rows — scanning and shuffling
    LINEITEM TWICE. But the final group keys (c_custkey … o_totalprice)
    are functionally determined by o_orderkey, so the re-aggregated
    SUM(l_quantity) per group IS the per-order sum already computed for
    the HAVING filter: compute it ONCE, filter, and join the tiny
    qualifying (orderkey, qty) set to orders ⋈ customer — the
    aggregate-pushdown-through-join rewrite Catalyst does not do itself
    (the two lineitem exchanges differ — partial-agg rows vs raw rows —
    so ReuseExchange can't fire on the textbook plan). One lineitem
    scan + one shuffle instead of two of each (plan-pinned in
    tests/test_plans.py::test_q18_single_lineitem_scan); at 100 TB
    lineitem is the dominant table, and locally this measured
    1.35-1.48 → 1.14-1.15 s at sf0.1 (interleaved min-of-4 A/B,
    row-identical on clean AND duplicate-row corpora — the outer
    re-aggregate of ``qty`` keeps duplicate orders/customer rows
    doubling the sum exactly as the oracle's join-then-SUM does).
    The qualifying key set is a fixed *fraction* of orders (grows with
    SF), so the join strategy is left to Catalyst/AQE rather than a
    forced broadcast.

    r15: the per-order decimal sum is the query's heaviest per-row
    stack and l_orderkey is near-unique per input row, so partial
    aggregation cannot shrink the exchange anyway — ``widen_small_scan``
    hash-partitions the projected rows on the aggregation key when the
    scan provably cannot split, making the widening exchange the very
    one the groupBy needs (reused, no extra shuffle) and running the
    aggregate N-way. Measured sf0.1 min-of-3: 1.12 → 0.82 s; unchanged
    plan at any multi-split deployment."""
    li = widen_small_scan(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        spark,
        sf_dir,
        "lineitem",
        "l_orderkey",
    )
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("__qty"))
        .filter(F.col("__qty") > 150)
    )
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = customer.join(orders, customer.c_custkey == orders.o_custkey).join(
        per_order, F.col("o_orderkey") == F.col("l_orderkey")
    )
    grouped = joined.groupBy(
        "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice"
    ).agg(F.sum("__qty").cast("double").alias("sum_qty"))
    return grouped.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(20)


@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT {_REVENUE_SQL} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "pushdown", "tpch"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst
    derives the single-table residuals (brand ∈ {...}, size ≤ 25,
    quantity ranges) and pushes them below the join, so only candidate
    rows shuffle; the full disjunction evaluates post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, part.p_partkey == li.l_partkey)
    qty = F.col("l_quantity")
    size = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & size.between(1, 15) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & size.between(1, 20) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & size.between(1, 25) & qty.between(20, 30))
    )
    return joined.filter(cond).agg(_revenue_expr())


@register(
    "q8_market_share",
    """
    WITH all_sales AS (
        SELECT year(o_orderdate) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS vol,
               n1.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey  = o_custkey
        JOIN supplier ON s_suppkey  = l_suppkey
        JOIN part     ON p_partkey  = l_partkey
        JOIN nation n1 ON s_nationkey  = n1.n_nationkey
        JOIN nation n2 ON c_nationkey  = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01')
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN vol
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE)
           / CAST(CAST(SUM(vol) AS VARCHAR) AS DOUBLE) AS mkt_share
    FROM all_sales
    GROUP BY o_year
    """,
    tags=("join", "agg", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for a part
    type, by year — a conditional-sum ratio over a six-way join. The
    fixed-cardinality dims (both nation roles, nation⋈region) broadcast;
    supplier and part scale with SF, so their join strategy is left to
    Catalyst/AQE (broadcast at test SF, shuffle at 100×)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    cust_region = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("n2_key"))
    joined = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(cust_region), F.col("c_nationkey") == F.col("n2_key"))
    )
    vol = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 18, 6)
    nat1 = F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        (F.sum(nat1).cast("double") / F.sum(vol).cast("double")).alias("mkt_share")
    )


@register(
    "q9_margin_by_nation_year",
    """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity * 0.05
                         AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_margin
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN part     ON p_partkey  = l_partkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%5%'
    GROUP BY n_name, o_year
    """,
    tags=("join", "agg", "tpch"),
)
def q9_margin_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    matching a name pattern. The corpus has no partsupp, so unit cost is
    modeled as 5% of p_retailprice — same join/aggregate topology. The
    LIKE filter prunes part at the scan; supplier/part join strategy is
    left to Catalyst/AQE (both scale with SF), nation broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%5%"))
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    margin = dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.05,
        18,
        6,
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(F.sum(margin).cast("double").alias("sum_margin"))


@register(
    "q13_order_count_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
    GROUP BY c_count
    """,
    tags=("join", "outer", "agg", "tpch"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count histogram — left outer join
    (customers with zero orders count as 0) then a second aggregate over
    the first's output. The second shuffle is over |distinct counts|,
    essentially free."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy(customer.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q16_supplier_part_variety",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "distinct", "tpch"),
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part attribute combo
    (supplier↔part linkage via lineitem, standing in for partsupp).
    COUNT(DISTINCT) plans as a two-phase aggregate: dedup on
    (group, suppkey) then count — both shuffles carry deduped rows."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    joined = li.join(part, part.p_partkey == li.l_partkey)
    return joined.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


@register(
    "q22_idle_high_balance",
    """
    WITH avg_bal AS (
        SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               / count(*) AS v
        FROM customer WHERE c_acctbal > 0.0)
    SELECT c_nationkey,
           count(*) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT v FROM avg_bal)
      AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    tags=("join", "anti", "subquery", "tpch"),
)
def q22_idle_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers who never ordered — a
    scalar-subquery threshold (computed once, joined as a 1-row broadcast
    literal) plus a LEFT ANTI join against orders, grouped by nation."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("v")
    )
    rich = customer.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("v")
    )
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        _sum_dec_double("c_acctbal", "totacctbal"),
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH unit AS (
        SELECT l_partkey, l_suppkey,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                   AS unit_price
        FROM lineitem
        GROUP BY l_partkey, l_suppkey),
    ranked AS (
        SELECT l_partkey, l_suppkey, unit_price,
               min(unit_price) OVER (PARTITION BY l_partkey) AS min_price
        FROM unit)
    SELECT p_partkey, p_brand, s_name,
           round(unit_price, 6) AS best_unit_price
    FROM ranked
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE unit_price = min_price AND p_size <= 5
    """,
    tags=("join", "window", "subquery", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part — the classic correlated
    MIN subquery, decorrelated to a partition-window minimum over the
    observed unit prices (lineitem stands in for partsupp). part and
    supplier scale with SF — join strategy left to Catalyst/AQE.

    r16 (optimization guide §2.4 "two operations keyed the same way can
    share one exchange", the q18 keyed-repartition pattern): the
    (l_partkey, l_suppkey) aggregate and the per-part window minimum
    used to shuffle TWICE — ENSURE_REQUIREMENTS on the pair key, then
    again on l_partkey for the window. Keying ONE explicit exchange on
    l_partkey satisfies both (hash on a subset of the grouping key
    co-locates every pair of a part, and the window needs exactly that
    partitioning), so the plan drops to a single data exchange. The
    trade — losing map-side partial aggregation — is the measured-good
    q18 trade here too: (part, supplier) pairs are near-unique per
    input row (~4 rows/pair), so the partial agg barely shrank the
    exchange while the heavy decimal-CASE sums ran in the single scan
    task; keyed-first they run N-way. Measured 1.48 → 0.79 s at sf0.1,
    row-identical at sf0.01/sf0.1 (plans/r16). At scale: one exchange
    of three narrow columns instead of two of the near-same row count."""
    li = load_table(spark, sf_dir, "lineitem")
    unit = (
        li.select("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.sum(dec("l_extendedprice")).cast("double")
                / F.sum(dec("l_quantity")).cast("double")
            ).alias("unit_price")
        )
    )
    w = Window.partitionBy("l_partkey")
    ranked = unit.withColumn("min_price", F.min("unit_price").over(w)).filter(
        F.col("unit_price") == F.col("min_price")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        ranked.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.round("unit_price", 6).alias("best_unit_price"),
        )
    )


@register(
    "q20_promo_heavy_suppliers",
    """
    WITH shipped AS (
        SELECT l_suppkey,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_qty,
               CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_quantity AS DECIMAL(18,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE)
                   AS promo_qty
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, promo_qty, total_qty
    FROM supplier JOIN shipped ON s_suppkey = l_suppkey
    WHERE promo_qty > 0.2 * total_qty
    """,
    tags=("join", "agg", "tpch"),
)
def q20_promo_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers whose shipped volume of a part class
    exceeds a fraction of their total — the nested IN-subquery chain
    decorrelated into one conditional aggregate per supplier joined back
    to the supplier dim. part and the per-supplier aggregate both scale
    with SF, so both join strategies stay with Catalyst/AQE."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, part.p_partkey == li.l_partkey)
    promo = F.when(F.col("p_type") == "PROMO", dec("l_quantity")).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    shipped = joined.groupBy("l_suppkey").agg(
        F.sum(dec("l_quantity")).cast("double").alias("total_qty"),
        F.sum(promo).cast("double").alias("promo_qty"),
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        supplier.join(shipped, supplier.s_suppkey == shipped.l_suppkey)
        .filter(F.col("promo_qty") > 0.2 * F.col("total_qty"))
        .select("s_suppkey", "s_name", "promo_qty", "total_qty")
    )


@register(
    "q21_sole_late_supplier",
    """
    WITH order_stats AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_suppliers,
               count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                   THEN l_suppkey END) AS n_late_suppliers
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        GROUP BY l_orderkey),
    late AS (
        SELECT DISTINCT li.l_orderkey, li.l_suppkey
        FROM lineitem li
        JOIN orders o ON o.o_orderkey = li.l_orderkey
        WHERE li.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    SELECT s_name, count(*) AS numwait
    FROM late
    JOIN order_stats USING (l_orderkey)
    JOIN supplier ON s_suppkey = late.l_suppkey
    WHERE n_suppliers > 1 AND n_late_suppliers = 1
    GROUP BY s_name
    """,
    tags=("join", "agg", "tpch"),
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *only* late shipper on a
    multi-supplier order — the reference formulation's EXISTS/NOT-EXISTS
    pair decorrelated into per-order supplier stats.

    r16 single-pass form (optimization guide §2.3/§2.4): the previous
    shape ran the lineitem⋈orders join TWICE (a per-order
    double-countDistinct branch — an Expand ×3 before its shuffle — and
    a distinct late-pair branch), then sort-merge-joined the branches
    back on l_orderkey: two lineitem scans, four keyed exchanges.  What
    the optimizer cannot see: every decision needs only the DISTINCT
    (order, supplier) pairs with an any-late flag.  So compute
    ``is_late`` before the exchange, shuffle the three narrow columns
    ONCE (``repartition("l_orderkey")``), and derive everything from
    that one partitioning: the pair-level ``max(__late)`` aggregate and
    the per-order counts (a window over the same key) both reuse it —
    no Expand, no countDistinct rewrite, no branch re-join.  Plan:
    1 lineitem scan (was 2), 1 data exchange + the final groupBy (was
    4), SortMergeJoin eliminated.  Measured 2.01 → 0.98 s at sf0.1,
    row-identical at sf0.001/0.01/0.1.  At scale the win grows: the
    removed pass is a full lineitem scan+join, and the one exchange
    carries (key, key, bool) instead of an Expand-tripled row set.
    ``l_suppkey IS NOT NULL`` is explicit: countDistinct ignored NULL
    suppkeys and the supplier equi-join dropped them — pre-filtering is
    equivalent and pushes into the scan.

    Tried and REJECTED (r9, the q17/q18 single-scan sweep): folding the
    late-pair branch into the stats aggregation via
    ``collect_set(when(is_late, suppkey))`` + ``element_at(.., 1)`` —
    row-identical but 2.2× SLOWER (ObjectHashAgg over the expanded
    set); the r16 form reaches one scan WITHOUT collect_set by keying
    the exchange on the order and letting the window reuse it."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lo = li.join(orders, orders.o_orderkey == li.l_orderkey)
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    slim = (
        lo.filter(F.col("l_suppkey").isNotNull())
        .select("l_orderkey", "l_suppkey", is_late.alias("__late"))
        .repartition("l_orderkey")
    )
    pairs = slim.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("__late").alias("__late")
    )
    w = Window.partitionBy("l_orderkey")
    flagged = pairs.select(
        "l_orderkey",
        "l_suppkey",
        "__late",
        F.count(F.lit(1)).over(w).alias("n_suppliers"),
        F.count(F.when(F.col("__late"), 1)).over(w).alias("n_late_suppliers"),
    )
    late = flagged.filter(
        F.col("__late")
        & (F.col("n_suppliers") > 1)
        & (F.col("n_late_suppliers") == 1)
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        late.join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q11_value_share_analog",
    """
    WITH natline AS (
      SELECT l_partkey,
             CAST(l_extendedprice * l_quantity AS DECIMAL(18,2)) AS v
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_7'),
    per_part AS (
      SELECT l_partkey AS ps_partkey,
             CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) AS part_value
      FROM natline GROUP BY 1),
    total AS (SELECT CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) AS t FROM natline)
    SELECT ps_partkey, part_value
    FROM per_part, total
    WHERE part_value > t * 0.001
    """,
    tags=("tpch", "q11"),
)
def q11_value_share_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's operator shape on the available tables (the corpus has
    no partsupp — PARITY.md documents the gap, this closes the SHAPE):
    one nation's per-part "inventory value" (Σ extendedprice×quantity as
    the supplycost×availqty stand-in), keeping parts whose value exceeds
    a fixed fraction of the nation-wide total — a grouped aggregate
    HAVING-compared against a global scalar. The scalar JOINS as a 1-row
    broadcast (like q22's avg-balance) rather than a correlated
    subquery — and since r9 it re-aggregates the PER-PART decimal sums
    instead of the natline lineage: decimal addition is exact and
    associative, so Σ(per-part Σv) ≡ Σv bit-for-bit, and both plan
    branches now share the l_partkey exchange (ReusedExchange fires —
    the partial-agg-below-exchange is identical, unlike q18's mismatch)
    so lineitem is scanned ONCE instead of twice. Measured sf0.1:
    +0.05-0.07 s locally (one extra stage + the broadcast exchange —
    scheduling, not data) for one fewer scan of the dominant fact
    table; at 100 TB the scan is the cost that matters and the shuffle
    was already being paid. Row-identical on clean and duplicate-row
    corpora. The nation filter reduces the fact before its shuffles;
    the one-nation supplier subset is left unhinted (it scales with SF
    — AQE decides); both compared values derive from the same exact
    decimal sum, so the > cut is engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    # The one-nation supplier subset still scales with SF, so no
    # broadcast hint — AQE demotes/promotes the join by measured size
    # (the repo-wide hint rule; nation itself is the only bounded side).
    natline = (
        li.join(
            supplier.join(
                F.broadcast(nation),
                supplier.s_nationkey == nation.n_nationkey,
            ).select("s_suppkey"),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .select(
            "l_partkey",
            dec(F.col("l_extendedprice") * F.col("l_quantity"), 18, 2).alias("v"),
        )
    )
    per_part = natline.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        F.sum("v").alias("__pv")  # stay decimal: the total re-sums exactly
    )
    total = per_part.agg(F.sum("__pv").cast("double").alias("t"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("__pv").cast("double") > F.col("t") * 0.001)
        .select(
            "ps_partkey", F.col("__pv").cast("double").alias("part_value")
        )
    )
