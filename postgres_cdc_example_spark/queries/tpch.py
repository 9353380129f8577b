"""TPC-H-flavored multi-join analytics over the driver fixtures — the
join-heavy benchmark family (beyond the reference's surface, which has no
SQL joins at all: SURVEY.md §2.3).

Plan discipline, pinned by tests/test_plans.py conventions:
- the ONLY shuffle on the fact table is its join to `orders` (or its final
  group-by); every dimension chain is pre-joined and broadcast;
- date-range filters sit directly on the scans (pushed to parquet);
- revenue aggregates are rounded to cents only at the END of each group's
  sum, matching the oracle's operation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_cdc_example_spark.queries import register
from postgres_cdc_example_spark.sources.tables import load_table

def _rev() -> "F.Column":
    """Lazy: Column creation needs a live SparkContext (import happens at
    registry load, before any session exists in test collection)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey AND s.s_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue where the supplier serves a customer of its
    OWN nation. The local-supplier condition is an extra equi-term
    (c_nationkey = s_nationkey), not a post-filter, so the join builds only
    matching pairs. Orders carries the pushed date filter; customer and
    supplier sides broadcast."""
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = (
        load_table(spark, "orders", sf_dir)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name AS nation
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-merchandise revenue in
    a half-year window. Return-flag and date filters push to the scans; the
    top-20 is a TakeOrdered (per-partition heap + driver merge of 20 rows),
    never a full sort. Tie-break by c_custkey keeps the cut deterministic."""
    l = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    o = (
        load_table(spark, "orders", sf_dir)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name", "c_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "nation")
    )


@register(
    "q12_late_shipments",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           count(*) AS n_lineitems,
           count(*) FILTER (WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
             AS n_late
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: shipping-latency accounting per order priority —
    date arithmetic (interval add) inside a conditional aggregate, one
    fact-side shuffle."""
    l = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.count_if(late).alias("n_late"),
        )
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    WITH j AS (
      SELECT p.p_type, l.l_extendedprice * (1 - l.l_discount) AS rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1996-04-01'
    )
    SELECT round(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END), 2) AS promo_revenue,
           round(sum(rev), 2) AS total_revenue,
           round(100.0 * round(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END), 2)
                       / round(sum(rev), 2), 4) AS promo_share_pct
    FROM j
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one quarter. Both sums are
    rounded to cents BEFORE the ratio so the share is a pure function of the
    (stable) cent totals, immune to distributed summation order. The part
    dimension broadcasts; the ship-date filter pushes to the fact scan."""
    l = (
        load_table(spark, "lineitem", sf_dir)
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    promo = F.round(
        F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))), 2
    )
    total = F.round(F.sum(_rev()), 2)
    return j.agg(
        promo.alias("promo_revenue"),
        total.alias("total_revenue"),
        F.round(F.lit(100.0) * promo / total, 4).alias("promo_share_pct"),
    )
