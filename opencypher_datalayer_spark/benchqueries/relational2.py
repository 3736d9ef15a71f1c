"""Relational coverage, part 2: the TPC-H operator shapes part 1 lacks —
correlated scalar subqueries, HAVING against global aggregates,
disjunctive pushdown predicates, self-join EXISTS/NOT EXISTS, IN-style
semi joins on aggregated keys, CUBE, and the full window-function family
(lag/lead/first_value/ntile).

Queries adapt TPC-H Q10/Q12/Q14/Q15/Q17/Q18/Q19/Q21/Q22 to the driver
tables' simplified columns (no partsupp/shipmode/phone — FIXTURES.md).
Decimal discipline follows part 1: order-independent exact accumulation,
IEEE doubles only in per-row ops or single final divisions mirrored
verbatim in the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries import QueryDef
from opencypher_datalayer_spark.benchqueries.relational import _dec, _dec6
from opencypher_datalayer_spark.sources.tables import load_table


# -- q10: returned-item revenue per customer (4-way join + top-k) -------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_returnflag") == "R")
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1998-01-01")) & (F.col("o_orderdate") < F.lit("1998-07-01"))
    )
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name, CAST(revenue AS DOUBLE) AS revenue
FROM (
  SELECT c_custkey, c_name, n_name,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
  GROUP BY c_custkey, c_name, n_name
  ORDER BY revenue DESC, c_custkey
  LIMIT 20
) t
"""


# -- q12: priority line counts (join + CASE aggregation) ----------------


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1998-01-01")) & (F.col("l_shipdate") < F.lit("1999-01-01"))
    )
    orders = load_table(spark, "orders", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
       COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# -- q14: promo revenue share (conditional-sum ratio) -------------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1998-01-01")) & (F.col("l_shipdate") < F.lit("1998-07-01"))
    )
    part = load_table(spark, "part", sf_dir)
    disc = _dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", disc)).cast("double")
            / F.sum(disc).cast("double")
        ).alias("promo_revenue_pct")
    )


Q14_SQL = """
SELECT 100.0 * CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                    FILTER (WHERE p_type = 'PROMO') AS DOUBLE)
            / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-07-01 00:00:00'
"""


# -- q15: top supplier (agg + scalar-subquery max equality) -------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1998-01-01")) & (F.col("l_shipdate") < F.lit("1998-04-01"))
    )
    supp = load_table(spark, "supplier", sf_dir)
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == top.mx)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# -- q17: small-quantity orders (correlated per-key avg subquery) -------


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).where(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part.ap_partkey)
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly")
        )
    )


Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN (
  SELECT l_partkey AS ap_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
) a ON l_partkey = ap_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * avg_qty
"""


# -- q18: large orders (HAVING + semi join on aggregated keys) ----------


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            _dec("o_totalprice").alias("totalprice"), "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(totalprice AS DOUBLE) AS totalprice, CAST(total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT c_custkey, c_name, o_orderkey, o_orderdate,
         CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice, total_qty
  FROM orders
  JOIN (
    SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
  ) big ON o_orderkey = big.l_orderkey
  JOIN customer ON o_custkey = c_custkey
  ORDER BY totalprice DESC, o_orderkey
  LIMIT 100
) t
"""


# -- q19: disjunctive pushdown predicates -------------------------------


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(cond).agg(
        F.sum(_dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)
"""


# -- q21-style: self-join EXISTS / NOT EXISTS ---------------------------


def q21_lone_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose returned lines sit in multi-supplier orders where
    no OTHER supplier returned anything — TPC-H Q21's exists/not-exists
    self-join shape on the simplified schema."""
    from pyspark.sql import Window

    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    # EXISTS/NOT-EXISTS without the self-joins (r13 optimization, guide
    # §2.4): over the distinct (order, supplier) pairs — one grouped
    # pass that also records whether the supplier returned anything —
    # "some OTHER supplier in the order" is n_supp > 1 and "no OTHER
    # supplier returned" is n_returners == 1 given has_r, both
    # per-order window aggregates. One lineitem scan and two shuffles
    # where the join shape paid two scans, two dedup shuffles, and a
    # semi + anti join pair. Verified row-identical vs the join shape
    # at sf0.1 before adoption; the oracle SQL is untouched.
    ps = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r")
    )
    w = Window.partitionBy("l_orderkey")
    candidates = (
        ps.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_r", F.sum("has_r").over(w))
        .where((F.col("has_r") == 1) & (F.col("n_supp") > 1) & (F.col("n_r") == 1))
    )
    return (
        candidates.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


Q21_SQL = """
WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
r_pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
SELECT s_name, numwait FROM (
  SELECT l1.l_suppkey, COUNT(*) AS numwait
  FROM r_pairs l1
  WHERE EXISTS (SELECT 1 FROM pairs l2
                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM r_pairs l3
                    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
  GROUP BY l1.l_suppkey
) w
JOIN supplier ON l_suppkey = s_suppkey
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# -- q22-style: global-avg scalar subquery + anti join ------------------


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average balance and no large orders, grouped
    by a derived code — Q22's scalar-subquery + NOT EXISTS shape (no
    phone column; code = custkey mod 10; 'idle' = no order > 300k since
    every customer in the driver data has some order)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_totalprice") > 300000)
        .select("o_custkey")
        .dropDuplicates()
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 10).alias("code"))
        .agg(F.count("*").alias("numcust"), F.sum(_dec("c_acctbal")).alias("totacctbal"))
        .orderBy("code")
    )


Q22_SQL = """
SELECT c_custkey % 10 AS code, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
GROUP BY 1
ORDER BY code
"""


# -- q11-style: HAVING against a global-total scalar --------------------


def q_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    value = _dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_supp = li.groupBy("l_suppkey").agg(F.sum(value).alias("supp_value"))
    total = li.agg(F.sum(value).alias("total_value"))
    return (
        per_supp.crossJoin(F.broadcast(total))
        .where(
            F.col("supp_value").cast("double")
            > 0.0015 * F.col("total_value").cast("double")
        )
        .select("l_suppkey", "supp_value")
        .orderBy(F.col("supp_value").desc(), "l_suppkey")
    )


Q_SUPPLIER_SHARE_SQL = """
WITH per_supp AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS supp_value
  FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, CAST(supp_value AS DOUBLE) AS supp_value
FROM per_supp
WHERE CAST(supp_value AS DOUBLE) > 0.0015 * (
  SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
  FROM lineitem
)
ORDER BY supp_value DESC, l_suppkey
"""


# -- q2-style: argmin per group + join back -----------------------------


def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each part, the supplier offering its minimum observed line
    price — TPC-H Q2's correlated-min shape on the simplified schema
    (lineitem stands in for partsupp). Window argmin with total
    tie-break, then join back for supplier attributes."""
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    part = load_table(spark, "part", sf_dir).where(F.col("p_size") <= 5)
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit_price").asc(), F.col("l_suppkey").asc()
    )
    offers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "l_partkey", "p_name", "l_suppkey",
            _dec6(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
    )
    return (
        offers.join(F.broadcast(supp), offers.l_suppkey == supp.s_suppkey)
        .select("l_partkey", "p_name", "s_name", "unit_price")
        .orderBy("l_partkey")
    )


# ROUND-then-CAST, not a bare CAST: DuckDB's double->DECIMAL cast
# rounds HALF-EVEN while Spark's rounds HALF-UP, and unit_price =
# extendedprice / quantity lands EXACTLY on a .5e-6 tie whenever
# quantity is a power of two (231.9825 / 8 = 28.9978125 — binary-exact,
# so the tie is real, not float noise; caught at sf0.1 where one such
# row exists). DuckDB ROUND() is half-up on positive doubles, and
# casting an already-rounded double to DECIMAL(18,6) just snaps to the
# nearest grid point — so round-then-cast matches Spark's cast for
# every value, ties included.
Q2_SQL = """
SELECT l_partkey, p_name, s_name, CAST(unit_price AS DOUBLE) AS unit_price
FROM (
  SELECT l_partkey, p_name, l_suppkey,
         CAST(ROUND(l_extendedprice / l_quantity, 6) AS DECIMAL(18,6)) AS unit_price,
         ROW_NUMBER() OVER (
           PARTITION BY l_partkey
           ORDER BY CAST(ROUND(l_extendedprice / l_quantity, 6) AS DECIMAL(18,6)) ASC,
                    l_suppkey ASC) AS rk
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size <= 5)
JOIN supplier ON l_suppkey = s_suppkey
WHERE rk = 1
ORDER BY l_partkey
"""


# -- q13-style: distribution of counts (left join + double group) -------


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed exactly N orders — the left-join +
    group-twice histogram shape (customers with zero orders included)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# -- q8-style: market share (yearly conditional-sum ratio) --------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASIA suppliers' share of yearly order revenue — conditional sum
    over a 5-way join, ratio as one double division per year."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    vol = _dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            (
                F.sum(F.when(F.col("r_name") == "ASIA", vol)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("asia_share"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("yr")
    )


Q8_SQL = """
SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
              FILTER (WHERE r_name = 'ASIA') AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
         AS asia_share,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
ORDER BY yr
"""


# -- q7: volume shipping between two nations ----------------------------

Q7_NATION_A = "NATION_9"  # synthetic nation names (driver data is not TPC-H-named)
Q7_NATION_B = "NATION_10"


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations by direction and
    year — the supplier nation comes from the lineitem side, the
    customer nation through orders, and the disjunctive pair filter
    keeps both directions. Both nation dimensions broadcast; the fact
    join is the only shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    vol = _dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    pair = (
        (F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B)
    ) | ((F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("o_orderdate").alias("yr"))
        .agg(F.sum(vol).cast("double").alias("revenue"), F.count("*").alias("n_lines"))
        .orderBy("supp_nation", "cust_nation", "yr")
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(YEAR FROM o_orderdate) AS yr,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
   OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}')
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, yr
"""


# -- LIKE / string-predicate pushdown ------------------------------------


def q_like_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix LIKE reaches the parquet scan as StringStartsWith (see
    test_plan_audit); contains/suffix predicates stay post-scan."""
    part = load_table(spark, "part", sf_dir)
    return (
        part.where(F.col("p_name").like("small %") & F.col("p_name").like("%get"))
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


Q_LIKE_SQL = """
SELECT p_partkey, p_name, p_brand
FROM part
WHERE p_name LIKE 'small %' AND p_name LIKE '%get'
ORDER BY p_partkey
"""


# -- window family: lag / lead / first_value / ntile --------------------


def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).where(F.col("o_custkey") % 50 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = _dec("o_totalprice")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        price.alias("price"),
        F.lag(price, 1).over(w).alias("prev_price"),
        F.lead(price, 1).over(w).alias("next_price"),
        F.first(price).over(w).alias("first_price"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("o_custkey", "o_orderkey")


Q_WINDOW_NAV_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
       CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2)), 1)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev_price,
       CAST(LEAD(CAST(o_totalprice AS DECIMAL(18,2)), 1)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS next_price,
       CAST(FIRST_VALUE(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS first_price,
       NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS quartile
FROM orders
WHERE o_custkey % 50 = 0
ORDER BY o_custkey, o_orderkey
"""


# -- CUBE grouping sets -------------------------------------------------


def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum(_dec("o_totalprice")).alias("total"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


Q_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# -- exact group percentiles -------------------------------------------

PCTS = (0.5, 0.9, 0.99)


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles of per-order revenue by market
    segment: the value at index floor((n-1)*p) of the ascending sort.
    Index-picking (instead of interpolating quantile functions) keeps
    the result engine-portable — the selected value is an exact decimal,
    no averaging, no library-specific interpolation. One revenue
    aggregate, one window rank per segment, then a tiny literal-array
    explode to emit the three percentile rows per group."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    rev = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(_dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cust.select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("revenue").asc(), F.col("l_orderkey").asc()
    )
    ranked = rev.select(
        "c_mktsegment",
        "revenue",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("c_mktsegment")).alias("n"),
    )
    return (
        ranked.select(
            "*", F.explode(F.array(*[F.lit(x) for x in PCTS])).alias("p")
        )
        .where(F.col("rn") - 1 == F.floor((F.col("n") - 1) * F.col("p")))
        .select(
            F.col("c_mktsegment").alias("segment"),
            "p",
            F.col("revenue").cast("double").alias("revenue_pct"),
        )
        .orderBy("segment", "p")
    )


Q_PERCENTILES_SQL = f"""
WITH rev AS (
  SELECT l_orderkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS revenue
  FROM lineitem GROUP BY l_orderkey),
j AS (
  SELECT c_mktsegment, revenue, l_orderkey
  FROM rev JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey),
ranked AS (
  SELECT c_mktsegment, revenue, l_orderkey,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY revenue ASC, l_orderkey ASC) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM j)
SELECT c_mktsegment AS segment, p, CAST(revenue AS DOUBLE) AS revenue_pct
FROM ranked,
     unnest([{", ".join(f"CAST({p} AS DOUBLE)" for p in PCTS)}]) AS t(p)
WHERE rn - 1 = floor((n - 1) * p)
ORDER BY segment, p
"""


# -- q9: product-type profit by nation and year -------------------------

Q9_PART_TOKEN = "red"  # p_name substring filter (synthetic part names)
Q9_COST_RATIO = "0.4"  # supply-cost stand-in: 40% of retail price — the
# driver tables have no partsupp (FIXTURES.md), so ps_supplycost is
# modeled as a fixed fraction of p_retailprice; the operator shape
# (5-way join, expression profit, two-level grouping) is Q9's.


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation and order year over
    parts matching a name token — revenue minus modeled supply cost,
    exact decimal accumulation, one cast to double at the end. The
    part and nation dimensions broadcast; the lineitem-orders join is
    the only large shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    part = load_table(spark, "part", sf_dir).where(
        F.col("p_name").contains(Q9_PART_TOKEN)
    )
    profit = _dec6(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.expr(Q9_COST_RATIO) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(profit).cast("double").alias("profit"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("nation", F.col("yr").desc())
    )


Q9_SQL = f"""
SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS yr,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - {Q9_COST_RATIO} * p_retailprice * l_quantity
                AS DECIMAL(18,6))) AS DOUBLE) AS profit,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{Q9_PART_TOKEN}%'
GROUP BY 1, 2
ORDER BY nation, yr DESC
"""


QUERIES = {
    "q9_product_profit": QueryDef(q9_product_profit, Q9_SQL, "5-way join + expression profit"),
    "q10_returned_items": QueryDef(q10_returned_items, Q10_SQL, "4-way join + group + top-20"),
    "q12_priority_lines": QueryDef(q12_priority_lines, Q12_SQL, "join + CASE aggregation"),
    "q14_promo_revenue": QueryDef(q14_promo_revenue, Q14_SQL, "conditional-sum ratio"),
    "q15_top_supplier": QueryDef(q15_top_supplier, Q15_SQL, "scalar-subquery max equality"),
    "q17_small_quantity": QueryDef(q17_small_quantity, Q17_SQL, "correlated per-key avg"),
    "q18_large_orders": QueryDef(q18_large_orders, Q18_SQL, "HAVING + join on agg keys"),
    "q19_disjunctive": QueryDef(q19_disjunctive, Q19_SQL, "OR-of-conjunctions pushdown"),
    "q21_lone_returner": QueryDef(q21_lone_returner, Q21_SQL, "self-join EXISTS/NOT EXISTS"),
    "q22_idle_customers": QueryDef(q22_idle_customers, Q22_SQL, "global-avg scalar + anti join"),
    "q_supplier_share": QueryDef(q_supplier_share, Q_SUPPLIER_SHARE_SQL, "HAVING vs global total"),
    "q2_cheapest_supplier": QueryDef(q2_cheapest_supplier, Q2_SQL, "per-group argmin + join back"),
    "q13_order_distribution": QueryDef(
        q13_order_distribution, Q13_SQL, "count-histogram via double grouping"
    ),
    "q8_market_share": QueryDef(q8_market_share, Q8_SQL, "yearly conditional-sum ratio"),
    "q7_volume_shipping": QueryDef(
        q7_volume_shipping, Q7_SQL, "two-nation trade volume by direction and year"
    ),
    "q_like_pushdown": QueryDef(q_like_pushdown, Q_LIKE_SQL, "LIKE predicates on strings"),
    "q_window_navigation": QueryDef(
        q_window_navigation, Q_WINDOW_NAV_SQL, "lag/lead/first_value/ntile"
    ),
    "q_cube_agg": QueryDef(q_cube_agg, Q_CUBE_SQL, "CUBE grouping sets"),
    "q_percentiles": QueryDef(
        q_percentiles, Q_PERCENTILES_SQL, "exact index-picked group percentiles"
    ),
}
