"""Relational operator queries (SURVEY.md §2.4) with DuckDB oracles.

Numeric-determinism conventions (shared with every oracle):

- Money/price sums go through ``DECIMAL(18,4)`` so addition is exact
  and associative — identical across engines and shuffle orders.
- Averages and other float outputs are rounded (4–6 dp) and cast to
  DOUBLE on both sides.
- Integer sums are cast to BIGINT on both sides (DuckDB would widen
  to HUGEINT).
- Every LIMIT carries a full deterministic ORDER BY (explicit
  tie-breaker keys).
- Computed columns share the same alias in Spark and SQL — the driver
  compares by sorted column name.

Scale notes are attached per query; the shared rules: dimension joins
broadcast, aggregations rely on map-side partial agg, windows always
partition (never a global unpartitioned sort in the hot path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_orc_sink_spark.operators.relational import range_join, topk_per_group
from flink_orc_sink_spark.session import local_df
from flink_orc_sink_spark.sources.catalog import table


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(18,4)")


def money(expr: Column) -> Column:
    """ROUND(expr, 2) cast to DOUBLE — the money-output convention."""
    return F.round(expr, 2).cast("double")


def dbl(expr: Column, scale: int = 4) -> Column:
    return F.round(expr, scale).cast("double")


def revenue() -> Column:
    """``extendedprice * (1 - discount)`` in exact decimal. A function,
    not a module constant: building a Column requires a live
    SparkContext, and plain ``import`` (pytest collection, the driver's
    registry load) must work without one."""
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


REVENUE_SQL = "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"


# --- TPC-H-style analytical queries ----------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY.md §7.1): scan → filter → hash-agg → sort.

    Catalyst pushes the shipdate filter into the parquet scan and the
    ORC-style columnar batch keeps only 7 of 11 columns; partial
    aggregation reduces each partition to ≤6 rows before the shuffle,
    so the exchange is O(groups), not O(rows) — the shape that holds
    at 100 TB."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum(_dec("l_quantity"))).alias("sum_qty"),
            money(F.sum(_dec("l_extendedprice"))).alias("sum_base_price"),
            money(F.sum(revenue())).alias("sum_disc_price"),
            money(
                F.sum(revenue() * (F.lit(1) + _dec("l_tax")))
            ).alias("sum_charge"),
            dbl(F.avg("l_quantity")).alias("avg_qty"),
            dbl(F.avg("l_extendedprice")).alias("avg_price"),
            dbl(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM({REVENUE_SQL}), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM({REVENUE_SQL} * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
  CAST(ROUND(AVG(l_quantity), 4) AS DOUBLE) AS avg_qty,
  CAST(ROUND(AVG(l_extendedprice), 4) AS DOUBLE) AS avg_price,
  CAST(ROUND(AVG(l_discount), 6) AS DOUBLE) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem, filtered both sides, top 10 by
    revenue. The customer filter lands before the join (Catalyst
    pushdown); AQE picks broadcast for the filtered customer side."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money(F.sum(revenue())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(ROUND(SUM({REVENUE_SQL}), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way join with a region filter — the join-reordering /
    broadcast showcase. region, nation, supplier, customer are all
    dimension-sized: every hop off the lineitem spine stays broadcast,
    so the only big shuffle is the final small group-by."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(money(F.sum(revenue())).alias("revenue"))
    )


Q5_SQL = f"""
SELECT n_name, CAST(ROUND(SUM({REVENUE_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-filter-aggregate; every predicate reaches the parquet
    reader (PushedFilters), zero shuffle beyond the single-row final."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money(F.sum(_dec("l_extendedprice") * _dec("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue on returned items — join + agg +
    deterministic top-k."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money(F.sum(revenue())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
  CAST(ROUND(SUM({REVENUE_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- join modes -------------------------------------------------------

def join_inner_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain equi inner join, row-level output (filtered to stay small)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        "o_totalprice",
        "c_custkey",
        "c_name",
        "c_mktsegment",
    )


JOIN_INNER_SQL = """
SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 400000
"""


def join_left_outer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            money(F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0))).alias(
                "total_spend"
            ),
        )
    )


JOIN_LEFT_SQL = """
SELECT c_custkey, c_mktsegment,
  COUNT(o_orderkey) AS n_orders,
  CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 0), 2) AS DOUBLE) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


def join_full_outer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer vs supplier counts —
    nations present on either side survive with nulls on the other."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_suppliers"))
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full_outer").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        "n_customers",
        "n_suppliers",
    )


JOIN_FULL_SQL = """
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       c.n_customers AS n_customers, s.n_suppliers AS n_suppliers
FROM (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey) c
FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
  ON c.c_nationkey = s.s_nationkey
"""


def join_semi_with_open_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers holding at least one open ('O') order.
    Semi joins never duplicate the left side — at scale that halves
    the shuffle vs join+distinct."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


def join_anti_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_cross_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (tiny × tiny only — a cross join of big
    inputs is a design error, not a tuning problem)."""
    a = table(spark, sf_dir, "region").select(F.col("r_name").alias("region_a"))
    b = table(spark, sf_dir, "region").select(F.col("r_name").alias("region_b"))
    return a.crossJoin(b).filter(F.col("region_a") < F.col("region_b"))


JOIN_CROSS_SQL = """
SELECT a.r_name AS region_a, b.r_name AS region_b
FROM region a CROSS JOIN region b
WHERE a.r_name < b.r_name
"""


def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join through two broadcast dimensions: customer count and
    balance by region name. Both dims ship to every executor once;
    the fact side never shuffles for the join."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            money(F.sum(_dec("c_acctbal"))).alias("sum_acctbal"),
        )
    )


JOIN_BROADCAST_SQL = """
SELECT r_name, COUNT(*) AS n_customers,
  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


PRICE_TIERS = [
    ("T1_under_50k", 0, 50_000),
    ("T2_50k_150k", 50_000, 150_000),
    ("T3_150k_300k", 150_000, 300_000),
    ("T4_300k_plus", 300_000, 10_000_000),
]


def join_range_price_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: orders against a broadcast tier table on
    ``lo <= price < hi``. Broadcast keeps the non-equi condition off
    the shuffle path (SURVEY.md §2.4 theta joins)."""
    o = table(spark, sf_dir, "orders")
    buckets = local_df(spark, PRICE_TIERS, "tier string, lo int, hi int")
    return (
        range_join(o, buckets, "o_totalprice")
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum(_dec("o_totalprice"))).alias("tier_value"),
        )
    )


_tiers_values = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in PRICE_TIERS)
JOIN_RANGE_SQL = f"""
SELECT tier, COUNT(*) AS n_orders,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS tier_value
FROM orders
JOIN (VALUES {_tiers_values}) AS buckets(tier, lo, hi)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY tier
"""


# --- aggregation variants --------------------------------------------

def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting per group (expand-based under the hood;
    for 100 TB dashboards prefer approx_count_distinct — kept exact
    here because the oracle must match)."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
        dbl(F.avg("c_acctbal")).alias("avg_bal"),
        money(F.min(_dec("c_acctbal"))).alias("min_bal"),
        money(F.max(_dec("c_acctbal"))).alias("max_bal"),
    )


AGG_COUNT_DISTINCT_SQL = """
SELECT c_mktsegment,
  COUNT(DISTINCT c_nationkey) AS n_nations,
  COUNT(*) AS n_customers,
  CAST(ROUND(AVG(c_acctbal), 4) AS DOUBLE) AS avg_bal,
  CAST(ROUND(MIN(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS min_bal,
  CAST(ROUND(MAX(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS max_bal
FROM customer GROUP BY c_mktsegment
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(returnflag, linestatus): per-pair, per-flag subtotal,
    grand total in one pass (Expand feeds one shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        money(F.sum(_dec("l_quantity"))).alias("sum_qty"),
        F.count("*").alias("n_rows"),
    )


AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(mktsegment, nationkey): all 4 grouping combinations."""
    c = table(spark, sf_dir, "customer")
    return c.cube("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("n_customers"),
        money(F.sum(_dec("c_acctbal"))).alias("sum_bal"),
    )


AGG_CUBE_SQL = """
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_customers,
  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_bal
FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — ((status), (priority), ()) — via Spark
    SQL (same Expand-based plan as rollup/cube)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


AGG_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- window functions -------------------------------------------------

def window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the per-group top-k operator
    (one shuffle on the group key, no global sort)."""
    o = table(spark, sf_dir, "orders")
    return topk_per_group(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rn")


WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank over part price within brand."""
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


WINDOW_RANK_SQL = """
SELECT p_brand, p_partkey, p_retailprice,
  RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS price_rank,
  DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS price_dense_rank
FROM part
"""


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running spend per customer over order history (ROWS frame)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        money(F.sum(_dec("o_totalprice")).over(w)).alias("running_spend"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend
FROM orders
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead across each customer's order sequence."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        money(F.lit(0) + F.col("o_totalprice")).alias("price"),
        money(F.lit(0) + prev).alias("prev_price"),
        money(F.lit(0) + F.lead("o_totalprice").over(w)).alias("next_price"),
        money(F.col("o_totalprice") - prev).alias("delta_prev"),
    )


WINDOW_LAG_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS price,
  CAST(ROUND(LAG(o_totalprice) OVER w, 2) AS DOUBLE) AS prev_price,
  CAST(ROUND(LEAD(o_totalprice) OVER w, 2) AS DOUBLE) AS next_price,
  CAST(ROUND(o_totalprice - LAG(o_totalprice) OVER w, 2) AS DOUBLE) AS delta_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over customer balances.

    SCALE NOTE: the unpartitioned window is an exact global ranking —
    Spark plans it as Exchange SinglePartition + one-task sort. That
    is the semantics' inherent cost and fine for dimension-sized
    inputs like customer; for fact-scale data use
    ``operators.relational.ntile_approx`` (approx-percentile
    bucketing, fully parallel — see tests/test_operators_relational)."""
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("bal_quartile"),
        dbl(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        dbl(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    )


WINDOW_NTILE_SQL = """
SELECT c_custkey, c_acctbal,
  NTILE(4) OVER w AS bal_quartile,
  CAST(ROUND(PERCENT_RANK() OVER w, 6) AS DOUBLE) AS bal_pct_rank,
  CAST(ROUND(CUME_DIST() OVER w, 6) AS DOUBLE) AS bal_cume_dist
FROM customer
WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per status, sum of order values within 1000 below
    each order's price (value-based frame, tie-stable by definition)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-1000, 0)
    )
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        money(F.sum(_dec("o_totalprice")).over(w)).alias("near_below_sum"),
    )


WINDOW_RANGE_SQL = """
SELECT o_orderstatus, o_orderkey, o_totalprice,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
    PARTITION BY o_orderstatus ORDER BY o_totalprice
    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS near_below_sum
FROM orders
"""


# --- sorts / limits / set ops ----------------------------------------

def sort_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-15 line items by price. Spark plans ORDER BY+LIMIT as
    TakeOrderedAndProject — per-partition heaps, no full sort."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
        )
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(15)
    )


SORT_TOPK_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 15
"""


def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations having both customers and suppliers."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


SET_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers.

    ``subtract`` is SQL EXCEPT DISTINCT (``exceptAll`` would be multiset
    subtraction — wrong semantics for this query)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)


SET_EXCEPT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


def set_union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two differently-shaped inputs into one tagged
    relation, then a count by origin + nation."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind")
    )
    return (
        c.unionByName(s)
        .groupBy("nationkey", "kind")
        .agg(F.count("*").alias("n_parties"))
    )


SET_UNION_SQL = """
SELECT nationkey, kind, COUNT(*) AS n_parties FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
) GROUP BY nationkey, kind
"""


# --- scalar functions --------------------------------------------------

def string_funcs_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function coverage on part names (SURVEY.md §2.4 scalar row)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.trim(F.col("p_name")).alias("name_trim"),
    )


STRING_FUNCS_SQL = """
SELECT p_partkey,
  UPPER(p_name) AS name_upper,
  LOWER(p_brand) AS brand_lower,
  LENGTH(p_name) AS name_len,
  SUBSTR(p_name, 1, 8) AS name_prefix,
  CONCAT_WS('|', p_brand, p_type) AS brand_type,
  REPLACE(p_type, ' ', '_') AS type_snake,
  STRPOS(p_name, 'a') AS first_a,
  LPAD(p_brand, 12, '*') AS brand_padded,
  REVERSE(p_brand) AS brand_rev,
  TRIM(p_name) AS name_trim
FROM part
"""


def date_funcs_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function coverage on order dates."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
        # Timestamp-typed on both sides: DATE survives the two engines'
        # pandas conversions differently (datetime.date vs datetime64),
        # so date-valued outputs are normalized to TIMESTAMP.
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
    )


DATE_FUNCS_SQL = """
SELECT o_orderkey,
  CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
  CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
  CAST(DAY(o_orderdate) AS INTEGER) AS order_day,
  CAST(QUARTER(o_orderdate) AS INTEGER) AS order_quarter,
  CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
  o_orderdate + INTERVAL 30 DAY AS due_date,
  CAST(DATEDIFF('day', o_orderdate, DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
  CAST(LAST_DAY(o_orderdate) AS TIMESTAMP) AS month_end
FROM orders
"""


def math_funcs_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function coverage on a deterministic lineitem subset."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") % 50 == 0) & (F.col("l_linenumber") == 1)
    )
    return li.select(
        "l_orderkey",
        dbl(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        dbl(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        dbl(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        dbl(F.pow(F.col("l_quantity"), 2), 2).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        dbl(F.greatest("l_discount", "l_tax"), 4).alias("max_rate"),
        dbl(F.least("l_discount", "l_tax"), 4).alias("min_rate"),
    )


MATH_FUNCS_SQL = """
SELECT l_orderkey,
  CAST(ROUND(ABS(l_discount - 0.05), 6) AS DOUBLE) AS disc_dev,
  CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
  CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
  CAST(ROUND(SQRT(l_quantity), 6) AS DOUBLE) AS qty_sqrt,
  CAST(ROUND(LN(l_extendedprice), 6) AS DOUBLE) AS price_ln,
  CAST(ROUND(POW(l_quantity, 2), 2) AS DOUBLE) AS qty_sq,
  l_orderkey % 7 AS key_mod7,
  CAST(ROUND(GREATEST(l_discount, l_tax), 4) AS DOUBLE) AS max_rate,
  CAST(ROUND(LEAST(l_discount, l_tax), 4) AS DOUBLE) AS min_rate
FROM lineitem
WHERE l_orderkey % 50 = 0 AND l_linenumber = 1
"""


def case_when_price_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    o = table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50_000, "small")
        .when(F.col("o_totalprice") < 200_000, "medium")
        .otherwise("large")
    )
    return (
        o.withColumn("price_tier", tier)
        .groupBy("price_tier", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            dbl(F.avg("o_totalprice")).alias("avg_price"),
        )
    )


CASE_WHEN_SQL = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS price_tier,
       o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(ROUND(AVG(o_totalprice), 4) AS DOUBLE) AS avg_price
FROM orders GROUP BY price_tier, o_orderstatus
"""


def in_subquery_building(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery semantics as a left-semi join (what Catalyst rewrites
    IN to anyway): orders from BUILDING-segment customers."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


IN_SUBQUERY_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderpriority
"""


def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: customers above the global average balance.
    The single-row aggregate is cross-joined (broadcast — it is one
    row), never collected to the driver."""
    c = table(spark, sf_dir, "customer")
    avg_bal = c.agg(F.avg("c_acctbal").alias("global_avg"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("global_avg"))
        .select("c_custkey", "c_name", "c_acctbal")
    )


SCALAR_SUBQUERY_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
"""


def distinct_flag_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (hash-agg without measures)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def null_handling_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: NULLIF/COALESCE/null-skipping aggregates."""
    c = table(spark, sf_dir, "customer")
    bal_pos = F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal"))
    seg2 = F.coalesce(
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
    )
    return (
        c.select(seg2.alias("seg2"), bal_pos.alias("bal_pos"))
        .groupBy("seg2")
        .agg(
            F.count("*").alias("n_total"),
            F.count("bal_pos").alias("n_positive"),
            money(F.coalesce(F.sum(_dec("bal_pos")), F.lit(0))).alias(
                "sum_positive"
            ),
        )
    )


NULL_HANDLING_SQL = """
SELECT COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg2,
  COUNT(*) AS n_total,
  COUNT(CASE WHEN c_acctbal >= 0 THEN c_acctbal END) AS n_positive,
  CAST(ROUND(COALESCE(SUM(CASE WHEN c_acctbal >= 0 THEN CAST(c_acctbal AS DECIMAL(18,4)) END), 0), 2) AS DOUBLE) AS sum_positive
FROM customer
GROUP BY seg2
"""


# --- second TPC-H-style wave: correlated patterns ---------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin-per-group (TPC-H Q2 pattern without partsupp): the
    supplier(s) achieving the minimum observed price for each size-10
    part. Correlated-min via window over one shuffle on the part key;
    dimension joins broadcast."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") == 10)
    s = table(spark, sf_dir, "supplier")
    pp = li.groupBy("l_partkey", "l_suppkey").agg(
        money(F.min(_dec("l_extendedprice"))).alias("supp_price")
    )
    w = Window.partitionBy("l_partkey")
    best = pp.withColumn(
        "best_price", F.min("supp_price").over(w)
    ).filter(F.col("supp_price") == F.col("best_price"))
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(s, best.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "supp_price")
    )


Q2_SQL = """
WITH pp AS (
  SELECT l_partkey, l_suppkey,
    CAST(ROUND(MIN(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS supp_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT *, MIN(supp_price) OVER (PARTITION BY l_partkey) AS best_price FROM pp
)
SELECT p_partkey, p_name, s_suppkey, s_name, supp_price
FROM best
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size = 10 AND supp_price = best_price
"""


def q4_exists_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with a non-equi condition (TPC-H Q4 pattern):
    orders having at least one line shipped more than 60 days after
    the order date. Semi join on the equi key with the inequality as a
    residual — never duplicates the left side."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral shipping volume (TPC-H Q7 pattern): revenue between
    every (supplier nation → customer nation) pair per ship-year.
    The lineitem spine joins orders once (the only big exchange);
    customer/supplier/nation hops all broadcast."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(money(F.sum(revenue())).alias("volume"))
    )


Q7_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
  CAST(YEAR(l_shipdate) AS INTEGER) AS ship_year,
  CAST(ROUND(SUM({REVENUE_SQL}), 2) AS DOUBLE) AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
GROUP BY supp_nation, cust_nation, ship_year
"""


def q8_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-ratio aggregate (TPC-H Q8/Q14 pattern): fraction of
    yearly revenue coming from PROMO-type parts. Numerator and
    denominator accumulate exactly in decimal; only the final ratio is
    floating point (rounded 6dp both engines)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    promo = F.when(p.p_type == "PROMO", revenue()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            money(F.sum(revenue())).alias("total_rev"),
            money(F.sum(promo)).alias("promo_rev"),
            dbl(F.sum(promo) / F.sum(revenue()), 6).alias("promo_share"),
        )
    )


Q8_SQL = f"""
SELECT CAST(YEAR(l_shipdate) AS INTEGER) AS ship_year,
  CAST(ROUND(SUM({REVENUE_SQL}), 2) AS DOUBLE) AS total_rev,
  CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL} ELSE 0 END), 2) AS DOUBLE) AS promo_rev,
  CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL} ELSE 0 END)
             / SUM({REVENUE_SQL}), 6) AS DOUBLE) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY ship_year
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 proper: promo revenue percentage for one ship month.

    Unlike :func:`q8_promo_share` (the yearly ratio family), this is the
    literal Q14 shape — a single month filter pushed into the lineitem
    scan, a broadcast join to ``part``, and one global conditional-ratio
    aggregate. At 100 TB the month filter prunes to ~1/80 of the fact
    scan before the join; ``part`` stays broadcast, so the only exchange
    is the final single-group partial-agg merge (O(partitions) rows)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01"))
        & (F.col("l_shipdate") < F.lit("1997-07-01"))
    )
    p = table(spark, sf_dir, "part")
    promo = F.when(p.p_type == "PROMO", revenue()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        dbl(F.lit(100) * F.sum(promo) / F.sum(revenue()), 6).alias(
            "promo_revenue_pct"
        ),
        money(F.sum(promo)).alias("promo_rev"),
        money(F.sum(revenue())).alias("total_rev"),
    )


Q14_SQL = f"""
SELECT
  CAST(ROUND(100 * SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL} ELSE 0 END)
             / SUM({REVENUE_SQL}), 6) AS DOUBLE) AS promo_revenue_pct,
  CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL} ELSE 0 END), 2) AS DOUBLE) AS promo_rev,
  CAST(ROUND(SUM({REVENUE_SQL}), 2) AS DOUBLE) AS total_rev
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-07-01'
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double aggregation (TPC-H Q13): customers per order count,
    preserving zero-order customers via left join. Two small shuffles
    (custkey, then count)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery max (TPC-H Q15): supplier(s) with the highest
    total revenue. The 1-row max is broadcast, never collected."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(money(F.sum(revenue())).alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(ROUND(SUM({REVENUE_SQL}), 2) AS DOUBLE) AS total_rev
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated average subquery (TPC-H Q17): revenue from lines
    whose quantity is below half their part's average quantity. The
    comparison ``2·n·q < Σq`` is pure decimal/integer math — exact and
    engine-independent (a float avg threshold could flip boundary rows
    between engines)."""
    li = table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("sum_q"),
        F.count("*").alias("n_q"),
    )
    joined = li.join(stats, "l_partkey").filter(
        _dec("l_quantity") * 2 * F.col("n_q") < F.col("sum_q")
    )
    return joined.agg(
        money(F.sum(_dec("l_extendedprice"))).alias("small_qty_revenue"),
        F.count("*").alias("n_lines"),
    )


Q17_SQL = """
WITH stats AS (
  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_q,
         COUNT(*) AS n_q
  FROM lineitem GROUP BY l_partkey
)
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS small_qty_revenue,
  COUNT(*) AS n_lines
FROM lineitem JOIN stats ON l_partkey = pk
WHERE CAST(l_quantity AS DECIMAL(18,4)) * 2 * n_q < sum_q
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING + semi-join-back (TPC-H Q18): orders whose total
    quantity exceeds 250, with customer context. The heavy side is
    aggregated FIRST (one shuffle on orderkey), then only qualifying
    keys rejoin — never a fat join before the filter."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(money(F.sum(_dec("l_quantity"))).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty"
        )
    )


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey,
    CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING total_qty > 250
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q11_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING against a global scalar (TPC-H Q11 pattern): parts whose
    total line value exceeds 1/1500 of the grand total. Both aggregates
    come from ONE shuffle (the per-part agg re-aggregates to the
    1-row total, which broadcasts back)."""
    li = table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(revenue()).alias("val_dec")
    )
    total = per_part.agg(F.sum("val_dec").alias("total_dec"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val_dec") * 1500 > F.col("total_dec"))
        .select("l_partkey", money(F.col("val_dec")).alias("part_value"))
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, SUM({REVENUE_SQL}) AS val_dec FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(ROUND(val_dec, 2) AS DOUBLE) AS part_value
FROM per_part
WHERE val_dec * 1500 > (SELECT SUM(val_dec) FROM per_part)
"""


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count with exclusion filters (TPC-H Q16 pattern):
    suppliers per (brand, type, size) for non-PROMO parts of small
    sizes. The NOT-filter prunes at the scan; distinct count expands
    only qualifying rows."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & (F.col("p_size").isin(1, 5, 10, 15))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO' AND p_size IN (1, 5, 10, 15)
GROUP BY p_brand, p_type, p_size
"""


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate (TPC-H Q19 pattern): three brand/quantity
    bands OR-ed together. Catalyst pushes the common ``l_quantity``
    bounds and partition-prunes each disjunct; the whole filter stays
    inside the scan stage — no join needed until the (broadcast)
    brand lookup."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        ((p.p_brand == "Brand#1") & (li.l_quantity.between(1, 15)))
        | ((p.p_brand == "Brand#7") & (li.l_quantity.between(10, 25)))
        | ((p.p_brand == "Brand#13") & (li.l_quantity.between(20, 35)))
    )
    return joined.filter(cond).agg(
        money(F.sum(revenue())).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


Q19_SQL = f"""
SELECT CAST(ROUND(SUM({REVENUE_SQL}), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#7' AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 20 AND 35)
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join + scalar subquery (TPC-H Q22 pattern): customers
    above the average positive balance with no URGENT order, counted
    per nation (every synthetic customer has some order, so the anti
    join targets the URGENT subset to stay non-trivial). The avg is a broadcast 1-row aggregate; the anti join
    never duplicates the left side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(avg_pos)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            money(F.sum(_dec("c_acctbal"))).alias("total_bal"),
        )
    )


Q22_SQL = """
SELECT c_nationkey, COUNT(*) AS n_customers,
  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


# --- pivot / unpivot / arrays / percentiles ---------------------------

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def agg_pivot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: market segments become columns (customer count per
    nation × segment). Explicit value list keeps the plan a single
    pass (unlisted pivots need an extra distinct scan)."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", SEGMENTS)
        .agg(F.count(F.lit(1)))
        .select(
            "c_nationkey",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s.lower()}") for s in SEGMENTS],
        )
    )


AGG_PIVOT_SQL = (
    "SELECT c_nationkey, "
    + ", ".join(
        f"COUNT(CASE WHEN c_mktsegment = '{s}' THEN 1 END) AS n_{s.lower()}"
        for s in SEGMENTS
    )
    + " FROM customer GROUP BY c_nationkey"
)


def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): part's numeric measures into (measure, value)
    rows — the long-format transform feeding generic per-metric
    pipelines. In-row expansion, no shuffle."""
    p = table(spark, sf_dir, "part")
    return p.unpivot(
        "p_partkey",
        [
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").cast("double").alias("retailprice"),
        ],
        "measure",
        "value",
    )


UNPIVOT_SQL = """
SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS measure, CAST(p_retailprice AS DOUBLE) AS value FROM part
"""


def array_funcs_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function coverage over the embedding column: size,
    element access, slicing, sorted prefix, elementwise transform
    aggregation — all in-row Catalyst higher-order functions."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dims"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_dim"),
        F.round(
            F.aggregate(
                F.slice("embedding", 1, 8),
                F.lit(0.0),
                lambda acc, v: acc + v.cast("double"),
            ),
            6,
        ).alias("head8_sum"),
        F.round(
            F.element_at(F.array_sort("embedding"), -1).cast("double"), 6
        ).alias("max_dim"),
        F.size(F.filter("embedding", lambda v: v > 0)).alias("n_positive"),
    )


ARRAY_FUNCS_SQL = """
SELECT vec_id,
  CAST(len(embedding) AS INTEGER) AS dims,
  CAST(ROUND(embedding[1]::DOUBLE, 6) AS DOUBLE) AS first_dim,
  CAST(ROUND(list_sum(list_transform(embedding[1:8], v -> v::DOUBLE)), 6) AS DOUBLE) AS head8_sum,
  CAST(ROUND(list_sort(embedding)[-1]::DOUBLE, 6) AS DOUBLE) AS max_dim,
  CAST(len(list_filter(embedding, v -> v > 0)) AS INTEGER) AS n_positive
FROM embeddings
"""


def map_funcs_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type function coverage: ``create_map`` from columns,
    ``map_concat`` with a computed entry, ``map_filter``, and
    ``map_entries``→explode back to rows. The map stays inside the
    row (no shuffle of map values); the output is exploded to plain
    (key, value) rows so the value-hash compare never depends on map
    ordering. The oracle rebuilds the same entries relationally."""
    o = table(spark, sf_dir, "orders")
    m = F.map_concat(
        F.create_map(
            F.lit("status"), F.col("o_orderstatus"),
            F.lit("priority"), F.col("o_orderpriority"),
        ),
        F.create_map(
            F.lit("bucket"),
            F.when(F.col("o_totalprice") > 200000, F.lit("big")).otherwise(
                F.lit(None).cast("string")
            ),
        ),
    )
    kept = F.map_filter(m, lambda k, v: v.isNotNull())
    return (
        o.select(F.explode(F.map_entries(kept)).alias("e"))
        .select(F.col("e.key").alias("attr"), F.col("e.value").alias("val"))
        .groupBy("attr", "val")
        .agg(F.count("*").alias("n_orders"))
    )


MAP_FUNCS_SQL = """
SELECT attr, val, COUNT(*) AS n_orders FROM (
  SELECT 'status' AS attr, o_orderstatus AS val FROM orders
  UNION ALL
  SELECT 'priority', o_orderpriority FROM orders
  UNION ALL
  SELECT 'bucket', 'big' FROM orders WHERE o_totalprice > 200000
) GROUP BY attr, val
"""


def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE (most frequent value) per group with a defined tie-break
    (smallest value wins) — ``mode()`` builtins leave ties
    implementation-defined, so the portable form is count +
    row_number, which is also the shape that scales: two map-side-
    combined shuffles on (group, value) then group, never a per-group
    value buffer. Here: the most common order priority per order
    status, with its share in parts-per-million (integer division)."""
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    # group total as a window-SUM over the SAME partitioning as the
    # ranking window — one exchange serves both, no second agg + join.
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "total", F.sum("n").over(Window.partitionBy("o_orderstatus"))
        )
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
            F.expr("(n * 1000000L) DIV total").alias("share_ppm"),
        )
    )


AGG_MODE_SQL = """
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY o_orderstatus, o_orderpriority
),
totals AS (
  SELECT o_orderstatus, COUNT(*) AS total FROM orders GROUP BY o_orderstatus
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority
    ) AS rn
  FROM counts
)
SELECT r.o_orderstatus, r.o_orderpriority AS mode_priority, r.n,
  (r.n * 1000000) // t.total AS share_ppm
FROM ranked r JOIN totals t ON r.o_orderstatus = t.o_orderstatus
WHERE r.rn = 1
"""


def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (linear interpolation — identical
    definition in Spark ``percentile`` and DuckDB ``quantile_cont``).
    Exact percentiles sort each group's values; at fact-table scale
    prefer ``percentile_approx`` (see ntile_approx) — kept exact here
    on the dimension-sized customer table."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.25)), 4)
        .cast("double")
        .alias("p25"),
        F.round(F.percentile("c_acctbal", F.lit(0.5)), 4)
        .cast("double")
        .alias("p50"),
        F.round(F.percentile("c_acctbal", F.lit(0.9)), 4)
        .cast("double")
        .alias("p90"),
    )


PERCENTILES_SQL = """
SELECT c_mktsegment,
  CAST(ROUND(quantile_cont(c_acctbal, 0.25), 4) AS DOUBLE) AS p25,
  CAST(ROUND(quantile_cont(c_acctbal, 0.5), 4) AS DOUBLE) AS p50,
  CAST(ROUND(quantile_cont(c_acctbal, 0.9), 4) AS DOUBLE) AS p90
FROM customer GROUP BY c_mktsegment
"""


# --- UDAF / sketch surface -------------------------------------------

def udaf_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDF (SURVEY.md §2.4 UDAF row): median
    order price per priority. Median is an order statistic — exact
    selection on the group's values, immune to the summation-order
    nondeterminism that makes float-sum UDAFs oracle-hostile. Arrow
    ships each group once; NumPy does the selection."""

    @F.pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(np.median(v))

    @F.pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        return len(v)

    # NB: grouped-agg pandas UDFs cannot mix with JVM aggregates in
    # one agg() — both measures are pandas UDAFs here.
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(median_udaf("o_totalprice"), 4).alias("median_price"),
        count_udaf("o_totalprice").alias("n_orders"),
    )


UDAF_MEDIAN_SQL = """
SELECT o_orderpriority,
  CAST(ROUND(median(o_totalprice), 4) AS DOUBLE) AS median_price,
  COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def agg_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch (approx_count_distinct): distinct
    customers per segment at bounded memory — THE 100 TB cardinality
    path (exact distinct shuffles every key; the sketch shuffles a few
    KB per group and merges order-independently).

    The raw HLL estimate is engine-specific, so the ORACLE-CHECKED
    surface is the sketch's error-bound CONTRACT: per group we emit
    the exact distinct count plus a boolean "estimate within the
    configured 5% rsd (3-sigma)" — DuckDB asserts the exact count and
    expects the verdict TRUE. A drifting sketch flips the hash."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.approx_count_distinct("c_custkey", rsd=0.05).alias("approx"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            (
                F.abs(F.col("approx") - F.col("n_customers"))
                <= 0.15 * F.col("n_customers")
            ).alias("within_rsd_bound"),
        )
    )


APPROX_SKETCH_SQL = """
SELECT c_mktsegment, COUNT(DISTINCT c_custkey) AS n_customers,
  TRUE AS within_rsd_bound
FROM customer GROUP BY c_mktsegment
"""


def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join profit rollup (TPC-H Q9 pattern, adapted: the
    testdata has no partsupp, so cost = 0.5 × retailprice × qty).
    LIKE-filtered part → lineitem ⋈ part ⋈ supplier ⋈ nation, grouped
    by nation × ship year. Scale: the LIKE filter prunes part before
    the join (pushed to the scan); part/supplier/nation broadcast, so
    the only exchange is lineitem's partial-agg shuffle."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    cost = _dec("p_retailprice") * _dec("l_quantity") * F.lit("0.5").cast(
        "decimal(18,4)"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("l_shipdate").alias("ship_year"))
        .agg(money(F.sum(revenue() - cost)).alias("profit"))
    )


Q9_SQL = f"""
SELECT n_name, CAST(YEAR(l_shipdate) AS INTEGER) AS ship_year,
  CAST(ROUND(SUM({REVENUE_SQL}
    - CAST(p_retailprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))
      * CAST(0.5 AS DECIMAL(18,4))), 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, ship_year
"""


def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional two-class counts (TPC-H Q12 pattern, adapted:
    l_linestatus stands in for shipmode — the testdata carries no
    shipmode/commitdate). Date-range filter is pushed to the lineitem
    scan; orders joins on the orderkey shuffle with map-side partial
    counts."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


def q21_exclusive_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-correlated EXISTS + NOT EXISTS on the fact table (TPC-H
    Q21 pattern, adapted: 'R' returnflag stands in for late receipt).
    Suppliers whose line was returned in a multi-supplier order where
    no OTHER supplier's line was returned. Spark shape: semi-join then
    anti-join, both keyed on l_orderkey — the same shuffle key, so AQE
    reuses one lineitem exchange for both probes; supplier broadcasts."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    ret = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    multi = ret.alias("l1").join(
        li.alias("l2"),
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole = multi.alias("l1").join(
        ret.alias("l3"),
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    s = table(spark, sf_dir, "supplier")
    return (
        sole.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested semi-join chain (TPC-H Q20 pattern, adapted: no
    partsupp, so 'potential promotion' = shipped > 50 units of some
    LIKE-matched part in 1996). The inner aggregate filters to
    qualifying (supplier, part) pairs; suppliers semi-join against it.
    Scale: the LIKE + date filters push to the scans; the inner
    groupBy is a partial-agg shuffle on a composite key; the final
    semi-join probes with a deduplicated, tiny key set (broadcast)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    s = table(spark, sf_dir, "supplier")
    heavy = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%gear%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 50
)
ORDER BY s_suppkey
"""


def string_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (levenshtein) — the scalar-func
    building block of entity resolution / noisy-string dedup. Pure
    per-row expression, map-only at any scale."""
    p = table(spark, sf_dir, "part")
    lev = F.levenshtein(F.col("p_name"), F.lit("small ring"))
    return (
        p.filter(lev <= 4)
        .select("p_partkey", "p_name", lev.cast("int").alias("edit_dist"))
    )


STRING_FUZZY_SQL = """
SELECT p_partkey, p_name,
  CAST(levenshtein(p_name, 'small ring') AS INTEGER) AS edit_dist
FROM part
WHERE levenshtein(p_name, 'small ring') <= 4
"""


def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram by computed bucket key (floor division —
    engine-portable, unlike width_bucket variants). One partial-agg
    shuffle on a small key domain."""
    o = table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("int")
    return (
        o.groupBy(bucket.alias("price_bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            money(F.min(_dec("o_totalprice"))).alias("bucket_min"),
            money(F.max(_dec("o_totalprice"))).alias("bucket_max"),
        )
    )


AGG_HISTOGRAM_SQL = """
SELECT CAST(FLOOR(o_totalprice / 50000) AS INTEGER) AS price_bucket,
  COUNT(*) AS n_orders,
  CAST(ROUND(MIN(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS bucket_min,
  CAST(ROUND(MAX(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS bucket_max
FROM orders
GROUP BY price_bucket
"""


def _skewed_fact_dim(spark: SparkSession, sf_dir: str):
    """Deterministic 50%-hot-key join inputs from lineitem: every
    even orderkey maps to key 0 (half the fact table on ONE key), odd
    keys spread uniformly over 10k; the dimension covers all keys.
    The pathological shuffle-skew shape, derived from the parquet
    tables so it scales with SF and stays DuckDB-reproducible (plain
    modulo, no engine-specific hash)."""
    l = table(spark, sf_dir, "lineitem")
    fact = l.select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.col("l_orderkey"), F.lit(10_000)))
        .cast("long")
        .alias("k"),
        "l_quantity",
    )
    dim = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("w")
    )
    return fact, dim


def join_skewed_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed join, AQE form (round-4 verdict #6): the 50%-hot fact
    joins the 10k-key dimension through a FORCED sort-merge join
    (merge hint — a broadcast would dissolve the skew and measure
    nothing), then aggregates. Under AQE the oversized post-shuffle
    partition is split at runtime (``skewJoin.enabled`` is on in
    session.py; the split firing is plan-asserted in
    tests/test_plan_budgets.py — on a MULTI-MAPPER fact, because AQE
    splits a skewed partition into mapper-range slices and the
    one-row-group local parquet fixture yields a single unsplittable
    map output; production scans have thousands of mappers).
    Benchmarked head-to-head with :func:`join_skewed_salted` — same
    oracle, different mitigation."""
    fact, dim = _skewed_fact_dim(spark, sf_dir)
    return (
        fact.join(dim.hint("merge"), "k")
        .groupBy("w")
        .agg(
            money(F.sum(_dec("l_quantity"))).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
    )


def join_skewed_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed join, explicit-salting form: the same 50%-hot inputs
    through ``operators/relational.py::salted_join`` — the shuffle
    key becomes (k, salt) so the hot key spreads over 16 tasks even
    where AQE can't see the skew. Identical results to the AQE form
    (same oracle proves it); the bench pair quantifies the
    mitigation trade."""
    from flink_orc_sink_spark.operators.relational import salted_join

    fact, dim = _skewed_fact_dim(spark, sf_dir)
    return (
        salted_join(fact, dim.hint("merge"), "k")
        .groupBy("w")
        .agg(
            money(F.sum(_dec("l_quantity"))).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
    )


JOIN_SKEWED_SQL = """
WITH fact AS (
  SELECT CASE WHEN l_orderkey % 2 = 0 THEN 0
              ELSE l_orderkey % 10000 END AS k,
         l_quantity
  FROM lineitem
),
dim AS (SELECT k, k % 7 AS w FROM range(10000) t(k))
SELECT w,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n_rows
FROM fact JOIN dim USING (k)
GROUP BY w
"""


def join_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-mitigation path through the correctness gate: revenue
    per market segment via :func:`operators.relational.salted_join`
    (orders fact side salted, customer side replicated per salt).
    Results are identical to the plain join — the oracle proves it —
    while the shuffle key (custkey, salt) spreads any pathological
    hot customer over 16 tasks."""
    from flink_orc_sink_spark.operators.relational import salted_join

    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        salted_join(o, c, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(money(F.sum(_dec("o_totalprice"))).alias("segment_rev"))
    )


JOIN_SALTED_SQL = """
SELECT c_mktsegment,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS segment_rev
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler over ``orders`` (the data-quality
    sweep before trusting a source): per column, row/null counts,
    stringified min/max, mean string length — ONE aggregation pass
    regardless of column count (a per-column loop would scan the
    table once per column; at 100 TB that is the difference between
    one job and nine). The HLL distinct estimate is dropped here
    because it is engine-specific; ``agg_approx_distinct_sketch``
    covers it with a rows-only check."""
    from flink_orc_sink_spark.operators.profile import profile_table

    o = table(spark, sf_dir, "orders")
    return profile_table(o).select(
        "column",
        "n_rows",
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        "min_str",
        "max_str",
        "mean_len",
    )


def _profile_orders_sql() -> str:
    cols = {
        "o_orderkey": False,
        "o_custkey": False,
        "o_orderstatus": True,
        "o_totalprice": False,
        "o_orderdate": False,
        "o_orderpriority": True,
    }
    parts = []
    for c, is_str in cols.items():
        mean_len = (
            f"CAST(ROUND(AVG(length({c})), 4) AS DOUBLE)"
            if is_str
            else "CAST(NULL AS DOUBLE)"
        )
        parts.append(
            f"""SELECT '{c}' AS column, COUNT(*) AS n_rows,
  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  CAST(MIN({c}) AS VARCHAR) AS min_str,
  CAST(MAX({c}) AS VARCHAR) AS max_str,
  {mean_len} AS mean_len
FROM orders"""
        )
    return "\nUNION ALL\n".join(parts)


def dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit over the fact table — the pre-load
    expectation suite every warehouse runs: null keys, non-positive
    amounts, out-of-range dates (one single-pass scan for all three),
    duplicate primary keys (one map-side-combined groupBy), and
    referential-integrity orphans against the customer dimension
    (broadcast anti-join on the deduplicated key set). Output is a
    (metric, value) report row per check.

    Scale shape: the three scan checks share ONE pass (a single agg
    producing three counters, unpivoted in-row via map+explode — at
    100 TB that is one job, not three); orphans probe a broadcast key
    set; only the duplicate check shuffles, on the primary key."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    flag = lambda cond: F.sum(cond.cast("long"))  # noqa: E731
    scan = (
        o.agg(
            flag(F.col("o_custkey").isNull()).alias("null_custkey"),
            flag(F.col("o_totalprice") <= 0).alias("nonpositive_totalprice"),
            flag(
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
                | (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
            ).alias("date_out_of_range"),
        )
        .select(
            F.explode(
                F.create_map(
                    F.lit("null_custkey"), F.col("null_custkey"),
                    F.lit("nonpositive_totalprice"),
                    F.col("nonpositive_totalprice"),
                    F.lit("date_out_of_range"), F.col("date_out_of_range"),
                )
            ).alias("metric", "value")
        )
    )
    dups = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count("*").alias("value"))
        .select(F.lit("dup_orderkeys").alias("metric"), "value")
    )
    orphans = (
        o.join(
            c.select("c_custkey").distinct(),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("value"))
        .select(F.lit("orphan_orders").alias("metric"), "value")
    )
    return scan.unionAll(dups).unionAll(orphans)


DQ_AUDIT_SQL = """
SELECT 'null_custkey' AS metric,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS value
FROM orders
UNION ALL
SELECT 'nonpositive_totalprice',
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'date_out_of_range',
       CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                       OR o_orderdate >= TIMESTAMP '1999-01-01'
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'dup_orderkeys', COUNT(*) FROM (
  SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
)
UNION ALL
SELECT 'orphan_orders', COUNT(*) FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
)
"""


def join_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-AWARE anti join (``NOT IN`` subquery semantics): because
    the probe column is nullable, the planner cannot use a plain anti
    join — one NULL in the probe set would make every ``NOT IN``
    evaluate to UNKNOWN (empty result). Spark therefore plans a
    null-aware anti join over the broadcast probe set; this query
    exercises that plan non-vacuously (the data's probe set is
    null-free, so rows survive), and the empty-when-null semantics is
    pytest-asserted in tests/test_operators_relational.py.

    Scale: keep ``NOT IN`` probes deduplicated and broadcastable
    (Spark's null-aware path requires a broadcastable build side);
    rewrite to ``NOT EXISTS`` when the probe side is big — it has no
    null trap and shuffles as an ordinary anti join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    c.createOrReplaceTempView("_c")
    o.createOrReplaceTempView("_o")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM _c
        WHERE c_nationkey < 5
          AND c_custkey NOT IN (
            SELECT o_custkey FROM _o
            WHERE o_orderstatus = 'F' AND o_totalprice > 200000
          )
        """
    )


NOT_IN_NULLS_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_nationkey < 5
  AND c_custkey NOT IN (
    SELECT o_custkey FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 200000
  )
"""


def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``percent_rank`` + ``cume_dist`` per market segment — the
    relative-standing window pair (both are exact rationals of integer
    ranks, so the doubles are bit-identical across engines without any
    rounding convention). Partitioned window — one shuffle."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        "c_acctbal", "c_custkey"
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


PERCENT_RANK_SQL = """
SELECT c_custkey, c_mktsegment, c_acctbal,
  PERCENT_RANK() OVER w AS pct_rank,
  CUME_DIST() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TRIANGLE COUNT over the part co-purchase graph (parts
    linked when they appear in the same order) — the graph-clustering
    primitive (clustering coefficient, community density, spam-graph
    detection) as an oracle-checked operator: counts are exact
    integers, so the distributed degree-ordered count hashes
    identically to the oracle's 3-way self-join.

    Shape at 100 TB: edge generation fans out per order (order sizes
    are bounded), and the count uses degree-ordered orientation
    (``operators/graph.py::triangle_count``) so the wedge join fans
    out by oriented out-degree — O(sqrt(m)) per node even on
    power-law graphs, where the oracle's naive a<b<c self-join would
    hot-spot on high-degree nodes. Same count, scale-safe plan.
    """
    from flink_orc_sink_spark.operators.graph import triangle_count

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    other = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("p2")
    )
    edges = (
        li.join(other, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("p2"))
        .select(F.col("l_partkey").alias("src"), F.col("p2").alias("dst"))
    )
    return triangle_count(edges)


TRIANGLE_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
  FROM li a JOIN li b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
)
SELECT
  (SELECT COUNT(*) FROM (
     SELECT x AS n FROM e UNION SELECT y FROM e)) AS n_nodes,
  (SELECT COUNT(*) FROM e) AS n_edges,
  (SELECT COUNT(*) FROM e e1
     JOIN e e2 ON e2.x = e1.y
     JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y) AS n_triangles
"""


def profile_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson CORRELATION MATRIX over lineitem's numeric measures —
    the feature-analysis primitive (redundant-feature pruning,
    leakage screens before model training) computed from EXACT
    moments: all five sums ride decimals (addition exact and
    associative, so shuffle order can't move a bit), and only the
    final closed-form combination runs in double — identical IEEE
    expression on identical inputs in both engines, rounded to 6 dp.

    Shape at 100 TB: ONE full-scan aggregate computes every moment
    for all pairs simultaneously (map-side partial agg, single
    reduce to one row); the pair explosion happens on that one row.
    No per-pair passes, no driver math.
    """
    li = table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    d = {c: F.col(c).cast("decimal(18,6)") for c in cols}
    aggs = [F.count("*").alias("n")]
    for c in cols:
        aggs.append(F.sum(d[c]).cast("decimal(38,6)").alias(f"s_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(
                F.sum((d[a] * d[b]).cast("decimal(38,12)"))
                .cast("decimal(38,12)")
                .alias(f"p_{a}_{b}")
            )
    m = li.agg(*aggs)

    def corr(a: str, b: str) -> Column:
        n = F.col("n").cast("double")
        sa = F.col(f"s_{a}").cast("double")
        sb = F.col(f"s_{b}").cast("double")
        saa = F.col(f"p_{a}_{a}").cast("double")
        sbb = F.col(f"p_{b}_{b}").cast("double")
        sab = F.col(f"p_{a}_{b}").cast("double")
        num = n * sab - sa * sb
        den = F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)
        return F.round(num / den, 6)

    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    rows = [
        m.select(
            F.lit(a).alias("col_x"),
            F.lit(b).alias("col_y"),
            corr(a, b).alias("pearson_r"),
        )
        for a, b in pairs
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


CORR_MATRIX_SQL = """
WITH m AS (
  SELECT COUNT(*) AS n,
    SUM(CAST(l_quantity AS DECIMAL(18,6))) AS s_q,
    SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS s_p,
    SUM(CAST(l_discount AS DECIMAL(18,6))) AS s_d,
    SUM(CAST(CAST(l_quantity AS DECIMAL(28,6))
           * CAST(l_quantity AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS p_qq,
    SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6))
           * CAST(l_extendedprice AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS p_pp,
    SUM(CAST(CAST(l_discount AS DECIMAL(28,6))
           * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS p_dd,
    SUM(CAST(CAST(l_quantity AS DECIMAL(28,6))
           * CAST(l_extendedprice AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS p_qp,
    SUM(CAST(CAST(l_quantity AS DECIMAL(28,6))
           * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS p_qd,
    SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6))
           * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS p_pd
  FROM lineitem
),
c AS (
  SELECT CAST(n AS DOUBLE) AS n,
    CAST(s_q AS DOUBLE) AS s_q, CAST(s_p AS DOUBLE) AS s_p,
    CAST(s_d AS DOUBLE) AS s_d,
    CAST(p_qq AS DOUBLE) AS p_qq, CAST(p_pp AS DOUBLE) AS p_pp,
    CAST(p_dd AS DOUBLE) AS p_dd, CAST(p_qp AS DOUBLE) AS p_qp,
    CAST(p_qd AS DOUBLE) AS p_qd, CAST(p_pd AS DOUBLE) AS p_pd
  FROM m
)
SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
  ROUND((n * p_qp - s_q * s_p)
    / (SQRT(n * p_qq - s_q * s_q) * SQRT(n * p_pp - s_p * s_p)), 6)
    AS pearson_r
FROM c
UNION ALL
SELECT 'l_quantity', 'l_discount',
  ROUND((n * p_qd - s_q * s_d)
    / (SQRT(n * p_qq - s_q * s_q) * SQRT(n * p_dd - s_d * s_d)), 6)
FROM c
UNION ALL
SELECT 'l_extendedprice', 'l_discount',
  ROUND((n * p_pd - s_p * s_d)
    / (SQRT(n * p_pp - s_p * s_p) * SQRT(n * p_dd - s_d * s_d)), 6)
FROM c
"""


def part_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE / Pareto frontier over part (maximize ``p_size``,
    minimize ``p_retailprice``): parts no other part dominates —
    the multi-objective shortlist primitive (cheapest-per-capability
    sweeps, instance-type selection). Dominance is exact double/int
    comparison, so the hash match is exact.

    Shape at 100 TB: the oracle's NOT EXISTS is a quadratic
    self-join; the engine instead aggregates min-price per size
    (map-side combined, ≤ distinct-sizes rows), computes the
    strictly-larger-size running minimum on that TINY table with one
    window, and broadcasts it back — the skyline falls out of one
    broadcast-joined filter. Linear scan, no self-join.
    """
    p = table(spark, sf_dir, "part")
    per_size = p.groupBy("p_size").agg(
        F.min("p_retailprice").alias("mn_at_size")
    )
    w = (
        Window.orderBy(F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sizes = per_size.select(
        "p_size",
        "mn_at_size",
        F.min("mn_at_size").over(w).alias("mn_gt_size"),
    )
    return (
        # bounded-broadcast: per-size minimum table: <= |distinct p_size| rows (bounded size domain)
        p.join(F.broadcast(sizes), "p_size")
        .filter(
            (F.col("p_retailprice") == F.col("mn_at_size"))
            & (
                F.col("mn_gt_size").isNull()
                | (F.col("mn_gt_size") > F.col("p_retailprice"))
            )
        )
        .select("p_partkey", "p_size", "p_retailprice")
    )


PARETO_SQL = """
SELECT p.p_partkey, p.p_size, p.p_retailprice
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
    AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice)
)
"""


def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN rank correlation (min-rank convention) between
    lineitem quantity and extended price — the robust, outlier-proof
    sibling of ``profile_corr_matrix``'s Pearson. Ranks are exact
    integers (``RANK()`` min-rank for ties — the convention is pinned
    so both engines agree; average-rank Spearman would put fractions
    in the moments), moments ride DECIMAL(38,0) (exact at any scale),
    and only the final closed form runs in double, rounded 6 dp.

    Shape at 100 TB: exact min-ranks WITHOUT a global row sort —
    ``rank(v) = 1 + Σ count(values < v)`` computed as a cumulative
    sum over the DISTINCT-VALUE count table (map-side-combined
    aggregate, then a window over |V| rows — the measure domain,
    orders of magnitude below row count) joined back onto the rows.
    One moment aggregate finishes; no full-table single-partition
    window anywhere.
    """
    li = table(spark, sf_dir, "lineitem")

    def rank_map(col: str, out: str) -> DataFrame:
        vc = li.groupBy(col).agg(F.count("*").alias("cnt"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return vc.select(
            col,
            (1 + F.coalesce(F.sum("cnt").over(w), F.lit(0)))
            .cast("long")
            .alias(out),
        )

    ranked = (
        li.select("l_quantity", "l_extendedprice")
        .join(rank_map("l_quantity", "rq"), "l_quantity")
        .join(rank_map("l_extendedprice", "rp"), "l_extendedprice")
        .select("rq", "rp")
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = ranked.agg(
        F.count("*").alias("n"),
        F.sum(d("rq")).cast("decimal(38,0)").alias("sq"),
        F.sum(d("rp")).cast("decimal(38,0)").alias("sp"),
        F.sum((d("rq") * d("rq"))).cast("decimal(38,0)").alias("sqq"),
        F.sum((d("rp") * d("rp"))).cast("decimal(38,0)").alias("spp"),
        F.sum((d("rq") * d("rp"))).cast("decimal(38,0)").alias("sqp"),
    )
    n = F.col("n").cast("double")
    sq = F.col("sq").cast("double")
    sp = F.col("sp").cast("double")
    sqq = F.col("sqq").cast("double")
    spp = F.col("spp").cast("double")
    sqp = F.col("sqp").cast("double")
    rho = (n * sqp - sq * sp) / (
        F.sqrt(n * sqq - sq * sq) * F.sqrt(n * spp - sp * sp)
    )
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(rho, 6).alias("spearman_rho"),
    )


SPEARMAN_SQL = """
WITH ranked AS (
  SELECT CAST(RANK() OVER (ORDER BY l_quantity) AS BIGINT) AS rq,
         CAST(RANK() OVER (ORDER BY l_extendedprice) AS BIGINT) AS rp
  FROM lineitem
),
m AS (
  SELECT COUNT(*) AS n,
    CAST(SUM(CAST(rq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sq,
    CAST(SUM(CAST(rp AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sp,
    CAST(SUM(CAST(rq AS DECIMAL(19,0)) * CAST(rq AS DECIMAL(19,0)))
      AS DECIMAL(38,0)) AS sqq,
    CAST(SUM(CAST(rp AS DECIMAL(19,0)) * CAST(rp AS DECIMAL(19,0)))
      AS DECIMAL(38,0)) AS spp,
    CAST(SUM(CAST(rq AS DECIMAL(19,0)) * CAST(rp AS DECIMAL(19,0)))
      AS DECIMAL(38,0)) AS sqp
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n,
  ROUND((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)
       - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
    / (SQRT(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
          - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
     * SQRT(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
          - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 6) AS spearman_rho
FROM m
"""


def part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKET-BASKET ASSOCIATION RULES over co-purchased parts:
    support / confidence / lift for part pairs appearing in the same
    order, top-20 by lift — the recommender / cross-sell primitive on
    the same co-occurrence backbone as ``graph_triangle_count``.
    Counts are exact; the ratios are the identical IEEE expression on
    those integers in both engines, rounded 6 dp, with full
    deterministic tie-break (lift desc, antecedent, consequent).

    Shape at 100 TB: pair generation fans out per order (bounded
    basket sizes), pair counts are one map-side-combined shuffle, and
    the per-item counts broadcast back onto the pair stream. The
    top-20 is ``TakeOrderedAndProject``, never a global sort.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    n_orders = li.select("l_orderkey").distinct().count()  # one scalar
    item = li.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    other = li.select("l_orderkey", F.col("l_partkey").alias("b"))
    pairs = (
        li.join(other, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("b"))
        .groupBy(F.col("l_partkey").alias("a"), "b")
        .agg(F.count("*").alias("n_pair"))
    )
    enriched = (
        pairs.join(
            item.select(
                F.col("l_partkey").alias("a"),
                F.col("n_item").alias("n_a"),
            ),
            "a",
        )
        .join(
            item.select(
                F.col("l_partkey").alias("b"),
                F.col("n_item").alias("n_b"),
            ),
            "b",
        )
    )
    lift = (
        F.col("n_pair").cast("double") * F.lit(float(n_orders))
    ) / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    return (
        enriched.select(
            "a",
            "b",
            "n_pair",
            "n_a",
            "n_b",
            F.round(F.col("n_pair").cast("double") / n_orders, 6).alias(
                "support"
            ),
            F.round(
                F.col("n_pair").cast("double") / F.col("n_a").cast("double"),
                6,
            ).alias("confidence"),
            F.round(lift, 6).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "a", "b")
        .limit(20)
    )


def _assoc_sql() -> str:
    return """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
item AS (SELECT l_partkey, COUNT(*) AS n_item FROM li GROUP BY l_partkey),
pairs AS (
  SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n_pair
  FROM li x JOIN li y USING (l_orderkey)
  WHERE x.l_partkey < y.l_partkey
  GROUP BY a, b
)
SELECT a, b, n_pair,
  ia.n_item AS n_a, ib.n_item AS n_b,
  ROUND(CAST(n_pair AS DOUBLE) / n.n_orders, 6) AS support,
  ROUND(CAST(n_pair AS DOUBLE) / ia.n_item, 6) AS confidence,
  ROUND(CAST(n_pair AS DOUBLE) * n.n_orders
      / (CAST(ia.n_item AS DOUBLE) * ib.n_item), 6) AS lift
FROM pairs
JOIN item ia ON ia.l_partkey = a
JOIN item ib ON ib.l_partkey = b
CROSS JOIN n
ORDER BY lift DESC, a, b
LIMIT 20
"""


def sales_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YEAR-OVER-YEAR growth per calendar month — the comparable-
    period reporting primitive (same-month-last-year, the TPC-DS
    "year over year" family). Monthly revenue rides exact
    DECIMAL(18,4) sums; the growth ratio is IEEE double on those
    exact values, rounded 6 dp.

    Shape at 100 TB: one map-side-combined monthly aggregate, then
    the LAG runs partitioned BY CALENDAR MONTH ordered by year —
    same-month-prior-year is a partition-local neighbor, so no
    global month sort exists in the plan at any scale.
    """
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"),
    )
    w = Window.partitionBy("mo").orderBy("yr")
    prev = F.lag("rev").over(w)
    return monthly.select(
        "yr",
        "mo",
        "n_orders",
        money(F.col("rev")).alias("revenue"),
        money(prev).alias("prev_year_revenue"),
        F.when(
            prev.isNotNull() & (prev != 0),
            F.round(
                (F.col("rev").cast("double") - prev.cast("double"))
                / prev.cast("double")
                * 100,
                6,
            ),
        ).alias("yoy_pct"),
    )


YOY_SQL = """
WITH monthly AS (
  SELECT YEAR(o_orderdate) AS yr, MONTH(o_orderdate) AS mo,
    COUNT(*) AS n_orders,
    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
  FROM orders GROUP BY yr, mo
)
SELECT yr, mo, n_orders,
  CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
  CAST(ROUND(LAG(rev) OVER w, 2) AS DOUBLE) AS prev_year_revenue,
  CASE WHEN LAG(rev) OVER w IS NOT NULL AND LAG(rev) OVER w <> 0
    THEN ROUND((CAST(rev AS DOUBLE) - CAST(LAG(rev) OVER w AS DOUBLE))
             / CAST(LAG(rev) OVER w AS DOUBLE) * 100, 6)
  END AS yoy_pct
FROM monthly
WINDOW w AS (PARTITION BY mo ORDER BY yr)
"""


def profile_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHANNON ENTROPY of categorical columns (bits) — the column-
    profiling primitive behind key-candidate detection, skew
    forecasting for join planning, and drift monitors. Counts are
    exact; each column's −Σ p·log2 p runs over its handful of
    category terms (≤ distinct values), rounded 6 dp.

    Shape at 100 TB: one map-side-combined count aggregate per
    column over a single scan (the two count tables union), then the
    entropy folds over category-sized groups. No row-level float
    math, no second scan.
    """
    o = table(spark, sf_dir, "orders")
    cols = ["o_orderstatus", "o_orderpriority"]
    counted = None
    for c in cols:
        cnt = o.groupBy(F.col(c).alias("val")).agg(
            F.count("*").alias("n")
        ).select(F.lit(c).alias("column"), "val", "n")
        counted = cnt if counted is None else counted.unionAll(cnt)
    tot = Window.partitionBy("column")
    p = F.col("n").cast("double") / F.sum("n").over(tot).cast("double")
    return (
        counted.withColumn("term", -p * F.log2(p))
        .groupBy("column")
        .agg(
            F.count("*").alias("n_values"),
            F.sum("n").alias("n_rows"),
            F.round(F.sum("term"), 6).alias("entropy_bits"),
        )
    )


ENTROPY_SQL = """
WITH counted AS (
  SELECT 'o_orderstatus' AS "column", o_orderstatus AS val,
         COUNT(*) AS n
  FROM orders GROUP BY val
  UNION ALL
  SELECT 'o_orderpriority', o_orderpriority, COUNT(*)
  FROM orders GROUP BY o_orderpriority
),
terms AS (
  SELECT "column", n,
    -(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY "column"))
     * LOG2(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY "column"))
     AS term
  FROM counted
)
SELECT "column", COUNT(*) AS n_values,
  CAST(SUM(n) AS BIGINT) AS n_rows,
  ROUND(SUM(term), 6) AS entropy_bits
FROM terms GROUP BY "column"
"""


def dq_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW first-digit audit of order totals — the classic
    fabricated-numbers screen (forensic accounting, synthetic-data
    detection). Observed digit counts are exact integers; each
    digit's expected share is the closed-form log10(1 + 1/d), so
    every float output is a per-row formula on exact inputs — no
    cross-row float accumulation at all. One map-side-combined
    aggregate over a single scan.
    """
    o = table(spark, sf_dir, "orders")
    digit = F.substring(
        F.regexp_replace(
            F.format_number(F.col("o_totalprice"), 10), r"[0.,]", ""
        ),
        1,
        1,
    ).cast("int")
    counted = (
        o.select(digit.alias("d"))
        .filter(F.col("d").between(1, 9))
        .groupBy("d")
        .agg(F.count("*").alias("n"))
    )
    tot = counted.agg(F.sum("n").alias("total"))
    exp_share = F.log10(1 + 1 / F.col("d").cast("double"))
    obs_share = F.col("n").cast("double") / F.col("total").cast("double")
    return counted.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        F.round(obs_share, 6).alias("obs_share"),
        F.round(exp_share, 6).alias("benford_share"),
        F.round(obs_share - exp_share, 6).alias("deviation"),
    )


BENFORD_SQL = """
WITH counted AS (
  SELECT CAST(SUBSTR(REGEXP_REPLACE(
           FORMAT('{:.10f}', o_totalprice), '[0.,]', '', 'g'), 1, 1)
         AS INTEGER) AS d,
    COUNT(*) AS n
  FROM orders
  GROUP BY d
),
valid AS (SELECT * FROM counted WHERE d BETWEEN 1 AND 9),
tot AS (SELECT SUM(n) AS total FROM valid)
SELECT d, n,
  ROUND(CAST(n AS DOUBLE) / total, 6) AS obs_share,
  ROUND(LOG10(1 + 1.0 / d), 6) AS benford_share,
  ROUND(CAST(n AS DOUBLE) / total - LOG10(1 + 1.0 / d), 6)
    AS deviation
FROM valid CROSS JOIN tot
"""


def agg_equidepth_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EQUI-DEPTH (equal-frequency) histogram of order totals — the
    optimizer-statistics / drift-monitoring primitive (equi-WIDTH is
    ``agg_price_histogram``; equi-depth is what engines actually keep,
    since it bounds per-bucket selectivity error). Bucket edges are
    exact interpolated percentiles (broadcast — one tiny row), bucket
    assignment is a map-side comparison, counts exact.

    Shape at 100 TB: ``percentile_approx`` replaces the exact
    percentile when the value set is too large to sort per group;
    here the exact form is used so the oracle can value-check
    assignment bit-for-bit."""
    o = table(spark, sf_dir, "orders")
    edges = o.agg(
        *[
            F.expr(
                f"percentile(o_totalprice, {q / 10})"
            ).alias(f"p{q}")
            for q in (2, 4, 6, 8)
        ]
    )
    bucket = (
        F.when(F.col("o_totalprice") < F.col("p2"), 0)
        .when(F.col("o_totalprice") < F.col("p4"), 1)
        .when(F.col("o_totalprice") < F.col("p6"), 2)
        .when(F.col("o_totalprice") < F.col("p8"), 3)
        .otherwise(4)
    )
    return (
        o.crossJoin(F.broadcast(edges))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            money(
                F.min(F.col("o_totalprice").cast("decimal(18,4)"))
            ).alias("lo"),
            money(
                F.max(F.col("o_totalprice").cast("decimal(18,4)"))
            ).alias("hi"),
        )
    )


EQUIDEPTH_SQL = """
WITH edges AS (
  SELECT quantile_cont(o_totalprice, 0.2) AS p2,
         quantile_cont(o_totalprice, 0.4) AS p4,
         quantile_cont(o_totalprice, 0.6) AS p6,
         quantile_cont(o_totalprice, 0.8) AS p8
  FROM orders
)
SELECT CASE WHEN o_totalprice < p2 THEN 0
            WHEN o_totalprice < p4 THEN 1
            WHEN o_totalprice < p6 THEN 2
            WHEN o_totalprice < p8 THEN 3
            ELSE 4 END AS bucket,
  COUNT(*) AS n_orders,
  CAST(ROUND(MIN(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
    AS lo,
  CAST(ROUND(MAX(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
    AS hi
FROM orders CROSS JOIN edges
GROUP BY bucket
"""


def profile_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS — ``l_extendedprice ~ l_quantity`` slope,
    intercept, and R² from the SAME exact-decimal moment machinery as
    ``profile_corr_matrix``: one map-side-combined scan computes the
    five sums exactly; the closed form runs once in double on those
    exact inputs, rounded 6 dp. The feature-screening regression
    (price-per-unit sanity, leakage detection) without any ML
    library, at any scale — moments are associative, so the single
    aggregate IS the distributed algorithm."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,6)")
    y = F.col("l_extendedprice").cast("decimal(18,6)")
    m = li.agg(
        F.count("*").alias("n"),
        F.sum(x).cast("decimal(38,6)").alias("sx"),
        F.sum(y).cast("decimal(38,6)").alias("sy"),
        F.sum((x * x).cast("decimal(38,12)"))
        .cast("decimal(38,12)")
        .alias("sxx"),
        F.sum((y * y).cast("decimal(38,12)"))
        .cast("decimal(38,12)")
        .alias("syy"),
        F.sum((x * y).cast("decimal(38,12)"))
        .cast("decimal(38,12)")
        .alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r * r, 6).alias("r_squared"),
    )


OLS_SQL = """
WITH m AS (
  SELECT COUNT(*) AS n,
    SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
    SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
    SUM(CAST(CAST(l_quantity AS DECIMAL(28,6))
           * CAST(l_quantity AS DECIMAL(28,6)) AS DECIMAL(38,12))) AS sxx,
    SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6))
           * CAST(l_extendedprice AS DECIMAL(28,6)) AS DECIMAL(38,12)))
      AS syy,
    SUM(CAST(CAST(l_quantity AS DECIMAL(28,6))
           * CAST(l_extendedprice AS DECIMAL(28,6)) AS DECIMAL(38,12)))
      AS sxy
  FROM lineitem
),
c AS (
  SELECT CAST(n AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS sx,
    CAST(sy AS DOUBLE) AS sy, CAST(sxx AS DOUBLE) AS sxx,
    CAST(syy AS DOUBLE) AS syy, CAST(sxy AS DOUBLE) AS sxy,
    n AS n_raw
  FROM m
),
r AS (
  SELECT n_raw, n, sx, sy,
    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
    (n * sxy - sx * sy)
      / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS rr
  FROM c
)
SELECT CAST(n_raw AS BIGINT) AS n,
  ROUND(slope, 6) AS slope,
  ROUND((sy - slope * sx) / n, 6) AS intercept,
  ROUND(rr * rr, 6) AS r_squared
FROM r
"""


def part_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY JOIN without the quadratic scan: every pair of distinct
    part names within Levenshtein distance 2, found by SymSpell
    deletion-neighborhood blocking (``operators/dedup.py::
    symspell_pairs``) — variants fan out by key LENGTH, candidates
    come from one equi-join, and the exact ``levenshtein`` verify
    touches candidates only. The oracle IS the all-pairs cross join,
    so the hash match proves the blocking has zero false negatives —
    the guarantee that makes the scale path trustworthy. Entity
    resolution's core join at catalog scale (noisy product names,
    typo'd identities)."""
    from flink_orc_sink_spark.operators.dedup import symspell_pairs

    p = table(spark, sf_dir, "part")
    return symspell_pairs(p, "p_name", max_edit=2)


FUZZY_PAIRS_SQL = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS p_name_a, b.p_name AS p_name_b,
  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


def part_brand_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED closed-form OLS — per-brand slope of extended price on
    quantity (the price-sensitivity sweep run per segment): the same
    exact-decimal moments as ``profile_ols_regression``, but grouped
    by brand, so the WHOLE model fit is one map-side-combined
    aggregate per group — regression over a million groups costs one
    shuffle, which is why moment-form OLS (not gradient descent) is
    the distributed tool for per-segment fits. Degenerate groups
    (zero variance) surface as NULL slope rather than a crash."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(
        p.select("p_partkey", "p_brand"),
        li.l_partkey == p.p_partkey,
    )
    x = F.col("l_quantity").cast("decimal(18,6)")
    y = F.col("l_extendedprice").cast("decimal(18,6)")
    m = j.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("decimal(38,6)").alias("sx"),
        F.sum(y).cast("decimal(38,6)").alias("sy"),
        F.sum((x * x).cast("decimal(38,12)"))
        .cast("decimal(38,12)")
        .alias("sxx"),
        F.sum((x * y).cast("decimal(38,12)"))
        .cast("decimal(38,12)")
        .alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    var = n * sxx - sx * sx
    slope = F.when(var > 0, (n * sxy - sx * sy) / var)
    return m.select(
        "p_brand",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(
            F.when(var > 0, (sy - slope * sx) / n), 6
        ).alias("intercept"),
    )


BRAND_ELASTICITY_SQL = """
WITH m AS (
  SELECT p.p_brand, COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(28,6))
           * CAST(l_quantity AS DECIMAL(28,6)) AS DECIMAL(38,12)))
      AS DOUBLE) AS sxx,
    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(28,6))
           * CAST(l_extendedprice AS DECIMAL(28,6)) AS DECIMAL(38,12)))
      AS DOUBLE) AS sxy
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
),
s AS (
  SELECT p_brand, n, sx, sy,
    CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
      THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
         / (CAST(n AS DOUBLE) * sxx - sx * sx) END AS slope
  FROM m
)
SELECT p_brand, CAST(n AS BIGINT) AS n,
  ROUND(slope, 6) AS slope,
  ROUND(CASE WHEN slope IS NOT NULL
    THEN (sy - slope * sx) / n END, 6) AS intercept
FROM s
"""


def customer_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto 80/20) CLASSIFICATION of customers by revenue —
    the inventory/CRM segmentation staple: rank customers by exact
    decimal revenue, take the running share of total, and classify
    A (first 80% of revenue), B (next 15%), C (tail). Revenue and
    the cumulative sums are exact decimals; the share thresholds
    compare decimal-to-decimal via integer cross-multiplication
    (cum·100 vs total·80) so no float ever decides a class boundary.

    Shape at 100 TB: one map-side-combined per-customer aggregate,
    then the running sum over the PER-CUSTOMER table (entity domain,
    orders of magnitude below the fact stream — same honest global
    window as RFM). At 100 TB use the scale-safe twin
    ``customer_abc_approx`` (registered, value-oracled): classes
    resolved over the bounded digit-bucket histogram instead of an
    O(entities) single-task sort. Output: per-class counts and
    revenue.
    """
    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).alias("rev")
    )
    w = Window.orderBy(F.col("rev").desc(), "o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = per_cust.agg(F.sum("rev").alias("total"))
    ranked = per_cust.withColumn("cum", F.sum("rev").over(w)).crossJoin(
        F.broadcast(tot)
    )
    cls = (
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.groupBy(cls.alias("abc_class"))
        .agg(
            F.count("*").alias("n_customers"),
            money(F.sum("rev")).alias("class_revenue"),
        )
    )


ABC_SQL = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
  FROM orders GROUP BY o_custkey
),
tot AS (SELECT SUM(rev) AS total FROM per_cust),
ranked AS (
  SELECT o_custkey, rev,
    SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                   ROWS UNBOUNDED PRECEDING) AS cum
  FROM per_cust
)
SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
            WHEN cum * 100 <= total * 95 THEN 'B'
            ELSE 'C' END AS abc_class,
  COUNT(*) AS n_customers,
  CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS class_revenue
FROM ranked CROSS JOIN tot
GROUP BY abc_class
"""


def customer_abc_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALE-SAFE TWIN of ``customer_abc_analysis`` (round-11 verdict
    #3): the exact form's running revenue share sorts the PER-CUSTOMER
    table on one task — O(entities) rows at 100×. This twin keeps the
    map-side-combined per-customer aggregate but classifies at BUCKET
    granularity:

    1. revenue quantized to int64 hundredths-of-cents (exact decimal
       × 10⁴), then mapped to the deterministic digit bucket
       ``digits*100 + first-two-digits`` (string-derived — no float
       near a boundary; ≤ ~1,900 buckets for int64, monotonic in
       revenue);
    2. per-bucket histogram (count + exact decimal revenue sum) — a
       distributed aggregate with BOUNDED output;
    3. the running revenue share runs over the bucket domain only,
       class thresholds decided by integer cross-multiplication
       (cum·100 vs total·80/95) exactly as the exact twin.

    Approximation: a bucket straddling the 80%/95% boundary lands
    whole on the C-side of it (the class of its last member), i.e.
    class boundaries resolve at two-leading-digit revenue
    granularity. Deterministic, so DuckDB value-checks it exactly.
    No per-entity window, no broadcast of anything entity-sized."""
    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).alias("rev")
    )
    rev_q = (F.col("rev") * 10000).cast("long")
    s = rev_q.cast("string")
    b = per_cust.select(
        "rev",
        F.when(rev_q <= 0, F.lit(0))
        .otherwise(
            F.length(s).cast("long") * 100
            + F.substring(s, 1, 2).cast("long")
        )
        .alias("mb"),
    )
    hist = b.groupBy("mb").agg(
        F.count("*").alias("c"), F.sum("rev").alias("bucket_rev")
    )
    w = Window.orderBy(F.col("mb").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = per_cust.agg(F.sum("rev").alias("total"))
    ranked = hist.withColumn("cum", F.sum("bucket_rev").over(w)).crossJoin(
        F.broadcast(tot)
    )
    cls = (
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
    )
    return ranked.groupBy(cls.alias("abc_class")).agg(
        F.sum("c").alias("n_customers"),
        money(F.sum("bucket_rev")).alias("class_revenue"),
    )


ABC_APPROX_SQL = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
  FROM orders GROUP BY o_custkey
),
b AS (
  SELECT rev,
    CASE WHEN CAST(rev * 10000 AS BIGINT) <= 0 THEN 0
         ELSE LENGTH(CAST(CAST(rev * 10000 AS BIGINT) AS VARCHAR)) * 100
              + CAST(SUBSTR(CAST(CAST(rev * 10000 AS BIGINT) AS VARCHAR),
                            1, 2) AS BIGINT)
    END AS mb
  FROM per_cust
),
h AS (SELECT mb, COUNT(*) AS c, SUM(rev) AS bucket_rev FROM b GROUP BY mb),
tot AS (SELECT SUM(rev) AS total FROM per_cust),
ranked AS (
  SELECT mb, c, bucket_rev,
    SUM(bucket_rev) OVER (ORDER BY mb DESC) AS cum
  FROM h
)
SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
            WHEN cum * 100 <= total * 95 THEN 'B'
            ELSE 'C' END AS abc_class,
  CAST(SUM(c) AS BIGINT) AS n_customers,
  CAST(ROUND(SUM(bucket_rev), 2) AS DOUBLE) AS class_revenue
FROM ranked CROSS JOIN tot
GROUP BY 1
"""


def sales_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO-TO-REPORT: each nation's revenue as a share of its
    region's total (TPC-DS's ratio-to-parent reporting family).
    Revenue rides exact decimals; the region total is a window over
    the PER-NATION aggregate partitioned by region (25 rows — the
    dimension domain), so the share division is the only float,
    rounded 6 dp.

    Shape at 100 TB: dimensions broadcast onto the fact scan, one
    map-side-combined aggregate to nation grain, then window + share
    on dimension-sized data. The fact stream shuffles once.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    per_nation = j.groupBy("r_name", "n_name").agg(
        F.sum(_dec("o_totalprice")).alias("rev")
    )
    w = Window.partitionBy("r_name")
    return per_nation.select(
        "r_name",
        "n_name",
        money(F.col("rev")).alias("nation_revenue"),
        money(F.sum("rev").over(w)).alias("region_revenue"),
        F.round(
            F.col("rev").cast("double")
            / F.sum("rev").over(w).cast("double"),
            6,
        ).alias("share_of_region"),
    )


SHARE_OF_REGION_SQL = """
WITH per_nation AS (
  SELECT r.r_name, n.n_name,
    SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT r_name, n_name,
  CAST(ROUND(rev, 2) AS DOUBLE) AS nation_revenue,
  CAST(ROUND(SUM(rev) OVER (PARTITION BY r_name), 2) AS DOUBLE)
    AS region_revenue,
  ROUND(CAST(rev AS DOUBLE)
      / CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE), 6)
    AS share_of_region
FROM per_nation
"""


def orders_lead_time_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLA LATENCY PERCENTILES — order-to-ship lead time p50/p90/p99
    per order priority (the fulfillment/latency reporting primitive;
    the same shape monitors API latencies and pipeline lag). Lead
    times are exact integer days (timestamp difference in whole
    days); percentiles use the shared exact-interpolation convention.

    Shape at 100 TB: one fact-fact join shuffles once on orderkey
    (AQE may broadcast the filtered side), then a per-priority
    aggregate — exact percentiles sort within the handful of
    priority groups; at extreme scale swap ``percentile_approx`` in
    per the histogram convention."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    # integer DIV (lead times are non-negative, so trunc == floor ==
    # DuckDB's //) — no float division anywhere near the day math
    days = F.expr(
        "(unix_micros(cast(l_shipdate as timestamp))"
        " - unix_micros(cast(o_orderdate as timestamp)))"
        " DIV 86400000000"
    )
    d = j.select("o_orderpriority", days.alias("lead_days"))
    return d.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lineitems"),
        F.round(F.percentile("lead_days", F.lit(0.5)), 4)
        .cast("double")
        .alias("p50_days"),
        F.round(F.percentile("lead_days", F.lit(0.9)), 4)
        .cast("double")
        .alias("p90_days"),
        F.round(F.percentile("lead_days", F.lit(0.99)), 4)
        .cast("double")
        .alias("p99_days"),
        F.max("lead_days").alias("max_days"),
    )


LEAD_TIME_SQL = """
WITH d AS (
  SELECT o.o_orderpriority,
    (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000
      AS lead_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority, COUNT(*) AS n_lineitems,
  CAST(ROUND(quantile_cont(lead_days, 0.5), 4) AS DOUBLE) AS p50_days,
  CAST(ROUND(quantile_cont(lead_days, 0.9), 4) AS DOUBLE) AS p90_days,
  CAST(ROUND(quantile_cont(lead_days, 0.99), 4) AS DOUBLE) AS p99_days,
  CAST(MAX(lead_days) AS BIGINT) AS max_days
FROM d GROUP BY o_orderpriority
"""


def parts_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (``WITH RECURSIVE``, Spark 4.x) — the iterative
    hierarchy walk as declarative SQL, the §2.4 recursion row. A
    synthetic forest is derived from the part table itself
    (``parent(p) = p DIV 10``, roots 1–9 — every key reaches a root
    in ≤ ⌈log₁₀ N⌉ steps), then ancestors are expanded recursively
    and rolled up per root: subtree size, max depth, integer size
    sum. Catalyst executes the recursion as a bounded union-loop —
    one hash join per level against the ever-smaller frontier, depth
    ≤ 7 even at 10⁷ parts, so the 100 TB story is ``O(log N)``
    small joins, not an unbounded iteration. All outputs integer ⇒
    value-hash-exact against DuckDB's own WITH RECURSIVE."""
    table(spark, sf_dir, "part").createOrReplaceTempView("part_rc")
    return spark.sql(
        """
        WITH RECURSIVE anc(root, partkey, depth, psize) AS (
          SELECT p_partkey, p_partkey, 0, p_size FROM part_rc
          WHERE p_partkey <= 9
          UNION ALL
          SELECT a.root, p.p_partkey, a.depth + 1, p.p_size
          FROM part_rc p JOIN anc a ON p.p_partkey DIV 10 = a.partkey
          WHERE p.p_partkey >= 10
        )
        SELECT root, COUNT(*) AS n_parts,
          CAST(MAX(depth) AS INT) AS max_depth,
          CAST(SUM(psize) AS BIGINT) AS sum_size
        FROM anc GROUP BY root
        """
    )


PARTS_HIERARCHY_SQL = """
WITH RECURSIVE anc(root, partkey, depth, psize) AS (
  SELECT p_partkey, p_partkey, 0, p_size FROM part
  WHERE p_partkey <= 9
  UNION ALL
  SELECT a.root, p.p_partkey, a.depth + 1, p.p_size
  FROM part p JOIN anc a ON p.p_partkey // 10 = a.partkey
  WHERE p.p_partkey >= 10
)
SELECT root, COUNT(*) AS n_parts,
  CAST(MAX(depth) AS INTEGER) AS max_depth,
  CAST(SUM(psize) AS BIGINT) AS sum_size
FROM anc GROUP BY root
"""


QUERIES = {
    "parts_hierarchy_rollup": parts_hierarchy_rollup,
    "orders_lead_time_sla": orders_lead_time_sla,
    "sales_share_of_region": sales_share_of_region,
    "customer_abc_analysis": customer_abc_analysis,
    "customer_abc_approx": customer_abc_approx,
    "part_brand_elasticity": part_brand_elasticity,
    "part_fuzzy_name_pairs": part_fuzzy_name_pairs,
    "agg_equidepth_histogram": agg_equidepth_histogram,
    "profile_ols_regression": profile_ols_regression,
    "profile_entropy": profile_entropy,
    "dq_benford_audit": dq_benford_audit,
    "sales_yoy_growth": sales_yoy_growth,
    "agg_spearman_corr": agg_spearman_corr,
    "part_association_rules": part_association_rules,
    "graph_triangle_count": graph_triangle_count,
    "profile_corr_matrix": profile_corr_matrix,
    "part_pareto_frontier": part_pareto_frontier,
    "dq_audit_orders": dq_audit_orders,
    "join_not_in_nulls": join_not_in_nulls,
    "join_skewed_hot_key": join_skewed_hot_key,
    "join_skewed_salted": join_skewed_salted,
    "window_percent_rank": window_percent_rank,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_exists_late_ship": q4_exists_late_ship,
    "q7_nation_volume": q7_nation_volume,
    "q8_promo_share": q8_promo_share,
    "q14_promo_effect": q14_promo_effect,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_orders": q18_large_orders,
    "q11_part_value_share": q11_part_value_share,
    "q16_supplier_variety": q16_supplier_variety,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "q22_idle_rich_customers": q22_idle_rich_customers,
    "q9_profit_by_nation": q9_profit_by_nation,
    "q12_priority_by_linestatus": q12_priority_by_linestatus,
    "q21_exclusive_returns": q21_exclusive_returns,
    "q20_heavy_shippers": q20_heavy_shippers,
    "string_fuzzy_match": string_fuzzy_match,
    "agg_price_histogram": agg_price_histogram,
    "join_salted_hot_keys": join_salted_hot_keys,
    "profile_orders": profile_orders,
    "join_inner_enrich": join_inner_enrich,
    "join_left_outer_agg": join_left_outer_agg,
    "join_full_outer_nations": join_full_outer_nations,
    "join_semi_with_open_order": join_semi_with_open_order,
    "join_anti_no_orders": join_anti_no_orders,
    "join_cross_regions": join_cross_regions,
    "join_broadcast_dims": join_broadcast_dims,
    "join_range_price_tiers": join_range_price_tiers,
    "agg_count_distinct": agg_count_distinct,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "window_topk_per_customer": window_topk_per_customer,
    "window_rank_dense": window_rank_dense,
    "window_running_total": window_running_total,
    "window_lag_lead": window_lag_lead,
    "window_ntile_quartiles": window_ntile_quartiles,
    "window_range_frame": window_range_frame,
    "sort_global_topk": sort_global_topk,
    "set_intersect_nations": set_intersect_nations,
    "set_except_nations": set_except_nations,
    "set_union_all_parties": set_union_all_parties,
    "string_funcs_showcase": string_funcs_showcase,
    "date_funcs_showcase": date_funcs_showcase,
    "math_funcs_showcase": math_funcs_showcase,
    "case_when_price_tiers": case_when_price_tiers,
    "in_subquery_building": in_subquery_building,
    "scalar_subquery_above_avg": scalar_subquery_above_avg,
    "distinct_flag_pairs": distinct_flag_pairs,
    "null_handling_showcase": null_handling_showcase,
    "udaf_median_price": udaf_median_price,
    "agg_pivot_segments": agg_pivot_segments,
    "unpivot_part_measures": unpivot_part_measures,
    "array_funcs_showcase": array_funcs_showcase,
    "map_funcs_showcase": map_funcs_showcase,
    "agg_mode_per_group": agg_mode_per_group,
    "agg_exact_percentiles": agg_exact_percentiles,
    "agg_approx_distinct_sketch": agg_approx_distinct_sketch,
}

ORACLES = {
    "parts_hierarchy_rollup": PARTS_HIERARCHY_SQL,
    "orders_lead_time_sla": LEAD_TIME_SQL,
    "sales_share_of_region": SHARE_OF_REGION_SQL,
    "customer_abc_analysis": ABC_SQL,
    "customer_abc_approx": ABC_APPROX_SQL,
    "part_brand_elasticity": BRAND_ELASTICITY_SQL,
    "part_fuzzy_name_pairs": FUZZY_PAIRS_SQL,
    "agg_equidepth_histogram": EQUIDEPTH_SQL,
    "profile_ols_regression": OLS_SQL,
    "profile_entropy": ENTROPY_SQL,
    "dq_benford_audit": BENFORD_SQL,
    "sales_yoy_growth": YOY_SQL,
    "agg_spearman_corr": SPEARMAN_SQL,
    "part_association_rules": _assoc_sql(),
    "graph_triangle_count": TRIANGLE_SQL,
    "profile_corr_matrix": CORR_MATRIX_SQL,
    "part_pareto_frontier": PARETO_SQL,
    "dq_audit_orders": DQ_AUDIT_SQL,
    "join_not_in_nulls": NOT_IN_NULLS_SQL,
    "join_skewed_hot_key": JOIN_SKEWED_SQL,
    "join_skewed_salted": JOIN_SKEWED_SQL,
    "window_percent_rank": PERCENT_RANK_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q10_returned_items": Q10_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q4_exists_late_ship": Q4_SQL,
    "q7_nation_volume": Q7_SQL,
    "q8_promo_share": Q8_SQL,
    "q14_promo_effect": Q14_SQL,
    "q13_order_count_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q18_large_orders": Q18_SQL,
    "q11_part_value_share": Q11_SQL,
    "q16_supplier_variety": Q16_SQL,
    "q19_disjunctive_predicates": Q19_SQL,
    "q22_idle_rich_customers": Q22_SQL,
    "q9_profit_by_nation": Q9_SQL,
    "q12_priority_by_linestatus": Q12_SQL,
    "q21_exclusive_returns": Q21_SQL,
    "q20_heavy_shippers": Q20_SQL,
    "string_fuzzy_match": STRING_FUZZY_SQL,
    "agg_price_histogram": AGG_HISTOGRAM_SQL,
    "join_salted_hot_keys": JOIN_SALTED_SQL,
    "profile_orders": _profile_orders_sql(),
    "join_inner_enrich": JOIN_INNER_SQL,
    "join_left_outer_agg": JOIN_LEFT_SQL,
    "join_full_outer_nations": JOIN_FULL_SQL,
    "join_semi_with_open_order": JOIN_SEMI_SQL,
    "join_anti_no_orders": JOIN_ANTI_SQL,
    "join_cross_regions": JOIN_CROSS_SQL,
    "join_broadcast_dims": JOIN_BROADCAST_SQL,
    "join_range_price_tiers": JOIN_RANGE_SQL,
    "agg_count_distinct": AGG_COUNT_DISTINCT_SQL,
    "agg_rollup": AGG_ROLLUP_SQL,
    "agg_cube": AGG_CUBE_SQL,
    "agg_grouping_sets": AGG_GROUPING_SETS_SQL,
    "agg_approx_distinct_sketch": APPROX_SKETCH_SQL,
    "window_topk_per_customer": WINDOW_TOPK_SQL,
    "window_rank_dense": WINDOW_RANK_SQL,
    "window_running_total": WINDOW_RUNNING_SQL,
    "window_lag_lead": WINDOW_LAG_SQL,
    "window_ntile_quartiles": WINDOW_NTILE_SQL,
    "window_range_frame": WINDOW_RANGE_SQL,
    "sort_global_topk": SORT_TOPK_SQL,
    "set_intersect_nations": SET_INTERSECT_SQL,
    "set_except_nations": SET_EXCEPT_SQL,
    "set_union_all_parties": SET_UNION_SQL,
    "string_funcs_showcase": STRING_FUNCS_SQL,
    "date_funcs_showcase": DATE_FUNCS_SQL,
    "math_funcs_showcase": MATH_FUNCS_SQL,
    "case_when_price_tiers": CASE_WHEN_SQL,
    "in_subquery_building": IN_SUBQUERY_SQL,
    "scalar_subquery_above_avg": SCALAR_SUBQUERY_SQL,
    "distinct_flag_pairs": DISTINCT_SQL,
    "null_handling_showcase": NULL_HANDLING_SQL,
    "udaf_median_price": UDAF_MEDIAN_SQL,
    "agg_pivot_segments": AGG_PIVOT_SQL,
    "unpivot_part_measures": UNPIVOT_SQL,
    "array_funcs_showcase": ARRAY_FUNCS_SQL,
    "map_funcs_showcase": MAP_FUNCS_SQL,
    "agg_mode_per_group": AGG_MODE_SQL,
    "agg_exact_percentiles": PERCENTILES_SQL,
}
