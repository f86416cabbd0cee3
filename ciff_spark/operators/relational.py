"""General relational breadth: aggregation, multi-way broadcast joins,
per-group top-k windows over the TPC-H-ish tables (the reference itself has
no relational operators — SURVEY §2.F — these demonstrate the engine surface
around the index)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ciff_spark.sources.testdata import load


def rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


REL_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_extendedprice), 6) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def rel_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 6).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


REL_NATION_REVENUE_SQL = """
SELECT n_name, round(sum(o_totalprice), 6) AS revenue, count(*)::BIGINT AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def rel_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("n_name", "rnk", "c_custkey", F.round("c_acctbal", 6).alias("acctbal"))
    )


REL_TOP_CUSTOMERS_SQL = """
SELECT n_name, rnk, c_custkey, round(c_acctbal, 6) AS acctbal FROM (
  SELECT n_name, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) WHERE rnk <= 3
"""


QUERIES: dict[str, tuple] = {
    "rel_pricing_summary": (rel_pricing_summary, REL_PRICING_SQL),
    "rel_nation_revenue": (rel_nation_revenue, REL_NATION_REVENUE_SQL),
    "rel_top_customers": (rel_top_customers, REL_TOP_CUSTOMERS_SQL),
}
