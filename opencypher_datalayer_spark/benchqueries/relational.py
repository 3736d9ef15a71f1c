"""Relational OLAP operator coverage over the TPC-H-ish tables.

These are the engine's extension surface beyond the reference's Cypher
dozen (SURVEY §2-R note): aggregations, multi-way joins, top-k, windows,
set ops, grouping sets, semi/anti joins, pivot, scalar functions — each
expressed declaratively so Catalyst handles pushdown/pruning/join
selection, and each paired with a DuckDB oracle.

Determinism rules for oracle hash-equality:
- sums of doubles go through DECIMAL casts (exact, order-independent);
- averages are decimal-sum divided as doubles (single IEEE op);
- top-k always carries a total tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries import QueryDef
from opencypher_datalayer_spark.sources.tables import load_table

DEC = "decimal(18,2)"
DEC6 = "decimal(18,6)"  # for products of 2dp doubles: exact at 6 decimals,
                        # immune to engine-specific double->decimal rounding


def _dec(c):
    return (F.col(c) if isinstance(c, str) else c).cast(DEC)


def _dec6(c):
    return (F.col(c) if isinstance(c, str) else c).cast(DEC6)


# -- q1: pricing summary (groupBy + 8 aggregates) -----------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = _dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    charge = _dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# -- q3: shipping priority (3-way join + top-k) -------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, "orders", sf_dir).where(F.col("o_orderdate") < F.lit("1998-01-15"))
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_shipdate") > F.lit("1998-01-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority, CAST(revenue AS DOUBLE) AS revenue
FROM (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-01-15 00:00:00'
    AND l_shipdate > TIMESTAMP '1998-01-15 00:00:00'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
  ORDER BY revenue DESC, l_orderkey
  LIMIT 10
) t
"""


# -- q5: local supplier volume (6-way join) -----------------------------


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, "region", sf_dir).where(F.col("r_name") == "ASIA")
    nation = load_table(spark, "nation", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1998-01-01")) & (F.col("o_orderdate") < F.lit("1998-07-01"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# -- q6: forecast revenue (pushdown filter + single agg) ----------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1998-01-01"))
            & (F.col("l_shipdate") < F.lit("1999-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_dec6(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# -- q4-style: EXISTS via left-semi join --------------------------------


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey").dropDuplicates()
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# -- anti join: customers with no orders --------------------------------


def q_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select("o_custkey").dropDuplicates()
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


Q_CUSTOMERS_NO_ORDERS_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# -- top-k per group via window rank ------------------------------------


def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select("n_name", "c_custkey", "c_name", _dec("c_acctbal").alias("acctbal"), "rk")
        .orderBy("n_name", "rk")
    )


Q_TOP_CUSTOMERS_SQL = """
SELECT n_name, c_custkey, c_name,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal, rk
FROM (
  SELECT c_nationkey, c_custkey, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
  FROM customer
) ranked
JOIN nation ON c_nationkey = n_nationkey
WHERE rk <= 3
ORDER BY n_name, rk
"""


# -- running total window (frame-based aggregation) ---------------------


def q_running_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).where(F.col("o_custkey") % 100 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec("o_totalprice")).over(w).alias("running_total"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


Q_RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
WHERE o_custkey % 100 = 0
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


# -- rollup (grouping sets) ---------------------------------------------


def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"), F.count("*").alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


Q_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


# -- set operations -----------------------------------------------------


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers segmented by order activity via INTERSECT / EXCEPT."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    active = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    inactive = cust.exceptAll(active.dropDuplicates()).dropDuplicates()
    both = cust.intersect(active)
    return (
        both.withColumn("segment", F.lit("big_spender"))
        .unionByName(inactive.withColumn("segment", F.lit("no_big_orders")))
        .groupBy("segment")
        .agg(F.count("*").alias("n"))
        .orderBy("segment")
    )


Q_SET_OPS_SQL = """
WITH active AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
),
big AS (SELECT c_custkey FROM customer INTERSECT SELECT c_custkey FROM active),
no_big AS (SELECT DISTINCT c_custkey FROM (SELECT c_custkey FROM customer EXCEPT ALL SELECT c_custkey FROM active))
SELECT segment, COUNT(*) AS n FROM (
  SELECT c_custkey, 'big_spender' AS segment FROM big
  UNION ALL
  SELECT c_custkey, 'no_big_orders' AS segment FROM no_big
) GROUP BY segment ORDER BY segment
"""


# -- pivot (conditional aggregation) ------------------------------------


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "O", _dec("l_quantity"))).alias("qty_open"),
            F.sum(F.when(F.col("l_linestatus") == "F", _dec("l_quantity"))).alias("qty_fulfilled"),
            F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("n_open"),
            F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("n_fulfilled"),
        )
        .orderBy("l_returnflag")
    )


Q_PIVOT_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_open,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_fulfilled,
       COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_fulfilled
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# -- scalar function library --------------------------------------------


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, "nation", sf_dir)
    return nation.select(
        "n_nationkey",
        F.upper("n_name").alias("upper_name"),
        F.lower("n_name").alias("lower_name"),
        F.length("n_name").alias("name_len"),
        F.substring("n_name", 1, 3).alias("prefix3"),
        F.concat_ws("-", "n_name", F.col("n_nationkey").cast("string")).alias("tagged"),
        F.reverse(F.col("n_name")).alias("reversed"),
        F.md5("n_name").alias("name_md5"),
        (F.col("n_nationkey") % 5).alias("mod5"),
        F.when(F.col("n_regionkey") < 2, "west").otherwise("east").alias("hemisphere"),
    ).orderBy("n_nationkey")


Q_SCALAR_SQL = """
SELECT n_nationkey,
       UPPER(n_name) AS upper_name,
       LOWER(n_name) AS lower_name,
       LENGTH(n_name) AS name_len,
       SUBSTRING(n_name, 1, 3) AS prefix3,
       CONCAT_WS('-', n_name, CAST(n_nationkey AS VARCHAR)) AS tagged,
       REVERSE(n_name) AS reversed,
       MD5(n_name) AS name_md5,
       n_nationkey % 5 AS mod5,
       CASE WHEN n_regionkey < 2 THEN 'west' ELSE 'east' END AS hemisphere
FROM nation
ORDER BY n_nationkey
"""


# -- date/time functions ------------------------------------------------


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            _dec("o_totalprice").alias("price"),
        )
        .groupBy("yr", "mo")
        .agg(F.count("*").alias("n_orders"), F.sum("price").alias("total"))
        .orderBy("yr", "mo")
    )


Q_DATE_SQL = """
SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, EXTRACT(MONTH FROM o_orderdate) AS mo,
       COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY 1, 2
ORDER BY yr, mo
"""


# -- distinct aggregation ----------------------------------------------


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


Q_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES = {
    "q1_pricing_summary": QueryDef(q1_pricing_summary, Q1_SQL, "TPC-H Q1: group + 8 aggs"),
    "q3_shipping_priority": QueryDef(q3_shipping_priority, Q3_SQL, "3-way join + top-10"),
    "q5_local_supplier": QueryDef(q5_local_supplier, Q5_SQL, "6-way join + agg"),
    "q6_forecast_revenue": QueryDef(q6_forecast_revenue, Q6_SQL, "filter + scalar agg"),
    "q_order_priority": QueryDef(q_order_priority, Q_ORDER_PRIORITY_SQL, "EXISTS semi-join"),
    "q_customers_no_orders": QueryDef(
        q_customers_no_orders, Q_CUSTOMERS_NO_ORDERS_SQL, "NOT EXISTS anti-join"
    ),
    "q_top_customers_per_nation": QueryDef(
        q_top_customers_per_nation, Q_TOP_CUSTOMERS_SQL, "window top-k per group"
    ),
    "q_running_order_total": QueryDef(
        q_running_order_total, Q_RUNNING_TOTAL_SQL, "running-total window frame"
    ),
    "q_rollup_lineitem": QueryDef(q_rollup_lineitem, Q_ROLLUP_SQL, "ROLLUP grouping sets"),
    "q_set_ops": QueryDef(q_set_ops, Q_SET_OPS_SQL, "INTERSECT / EXCEPT ALL"),
    "q_pivot_status": QueryDef(q_pivot_status, Q_PIVOT_SQL, "pivot via conditional agg"),
    "q_scalar_functions": QueryDef(q_scalar_functions, Q_SCALAR_SQL, "scalar function library"),
    "q_date_functions": QueryDef(q_date_functions, Q_DATE_SQL, "date part extraction"),
    "q_distinct_agg": QueryDef(q_distinct_agg, Q_DISTINCT_SQL, "COUNT DISTINCT"),
}
