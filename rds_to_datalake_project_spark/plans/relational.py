"""Relational query surface (SURVEY.md §2.3/2.4/2.5/2.6/2.7 — the SQL
layer the reference delegates to Athena, reference athena.py:16-87).

Cross-engine determinism rules used throughout (and in the oracles):
- double aggregates go through DECIMAL(38,6): per-row double
  arithmetic is IEEE-identical in Spark and DuckDB, the decimal SUM is
  exact and order-independent, and only the final value is cast back
  to double — so value hashes match bit-for-bit.
- averages are expressed as exact-decimal SUM divided by COUNT in
  double (a single, identical division on both engines).
- every ORDER BY ends with a unique key so LIMIT picks a
  deterministic row set.
- timestamps in outputs are epoch microseconds (bigint) or formatted
  strings — no engine-specific timestamp rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.catalog import load_table


def _dsum(col):
    """Exact, order-independent sum of a double expression."""
    return F.sum(col.cast("decimal(38,6)")).cast("double")


# --- Q1: pricing summary (groupBy + 8 aggregates, A-family) ----------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (_dsum(F.col("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)/COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)/COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE)/COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- Q3: shipping priority (3-way join + agg + top-k, J1/O-family) ----------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-03-15").cast("timestamp")
    )
    # No manual broadcast hint: filtered customer is small relative
    # to the facts but still scales with SF — AQE picks broadcast
    # while it fits and shuffle-join beyond.
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            F.unix_micros(F.col("o_orderdate")).alias("o_orderdate_us"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       epoch_us(o_orderdate) AS o_orderdate_us,
       o_orderpriority,
       CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-03-15'
  AND l_shipdate  > TIMESTAMP '1999-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- Q5: region revenue (5-way join incl. dims, broadcast pattern) ----------

def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    # Broadcast hints only on the tables that stay tiny at ANY scale
    # (region: 5 rows, nation: 25 rows). customer/supplier grow with
    # SF — AQE broadcasts them automatically while they fit and
    # switches to shuffle joins beyond the threshold at 100 TB.
    dim = (
        customer.join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(supplier, lineitem["l_suppkey"] == supplier["s_suppkey"])
        .join(
            dim,
            (orders["o_custkey"] == dim["c_custkey"])
            & (supplier["s_nationkey"] == dim["n_nationkey"]),
        )
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --- top customers per nation (window W-family over joins) ------------------

def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        orders.groupBy("o_custkey")
        .agg(_dsum(F.col("o_totalprice")).alias("total_spend"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey")
    )
    return (
        customer.join(spend, customer["c_custkey"] == spend["o_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .select("n_name", "c_custkey", "c_name", "total_spend")
        .withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
        .orderBy("n_name", "rank_in_nation")
    )


TOP_CUSTOMERS_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT n_name, c_custkey, c_name, total_spend,
       CAST(rank_in_nation AS INTEGER) AS rank_in_nation
FROM (
  SELECT n_name, c_custkey, c_name, total_spend,
         ROW_NUMBER() OVER (PARTITION BY n_name
                            ORDER BY total_spend DESC, c_custkey) AS rank_in_nation
  FROM customer
  JOIN spend  ON c_custkey = o_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
WHERE rank_in_nation <= 3
ORDER BY n_name, rank_in_nation
"""


# --- order-priority counts (A-family, conditional agg) -----------------------

def order_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
            _dsum(F.col("o_totalprice")).alias("total_value"),
            F.max(F.unix_micros(F.col("o_orderdate"))).alias("last_order_us"),
        )
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
       epoch_us(MAX(o_orderdate)) AS last_order_us
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- set difference (T-family, reference compare.py semantics) ---------------

def orders_except_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return o.exceptAll(o.filter(F.col("o_orderkey") % 3 == 0)).orderBy("o_orderkey")


EXCEPT_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
EXCEPT ALL
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 3 = 0
ORDER BY o_orderkey
"""


# --- scalar function surface (F-family) --------------------------------------

def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    od = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")  # F3/F4
    return o.select(
        "o_orderkey",
        od.alias("od_str"),
        F.substring(od, 1, 4).alias("od_year"),  # F1
        F.lpad(F.col("o_orderkey").cast("string"), 9, "0").alias("key_pad"),  # F5
        F.concat_ws("=", F.col("o_custkey").cast("string"), od).alias("composite_id"),  # F6
        F.split(F.col("o_orderpriority"), "-")[0].alias("prio_code"),  # F6
        F.when(F.col("o_orderpriority").contains("URGENT"), 1).otherwise(0).alias("is_urgent"),  # F10
        F.md5(F.lpad(F.col("o_orderkey").cast("string"), 9, "0").cast("binary")).alias("key_md5"),  # F11
        F.col("o_totalprice").cast("int").alias("price_int"),  # F9 (truncating cast)
    ).orderBy("o_orderkey")


SCALAR_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od_str,
       substring(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), 1, 4) AS od_year,
       lpad(CAST(o_orderkey AS VARCHAR), 9, '0') AS key_pad,
       concat_ws('=', CAST(o_custkey AS VARCHAR), strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')) AS composite_id,
       string_split(o_orderpriority, '-')[1] AS prio_code,
       CASE WHEN contains(o_orderpriority, 'URGENT') THEN 1 ELSE 0 END AS is_urgent,
       md5(lpad(CAST(o_orderkey AS VARCHAR), 9, '0')) AS key_md5,
       CAST(trunc(o_totalprice) AS INTEGER) AS price_int
FROM orders
ORDER BY o_orderkey
"""


# --- join family (J1 surface: inner comes via q3/q5; left/semi/anti here) ----

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (J1 family): customers with no 1-URGENT orders,
    counted per nation. Anti side is the big probe; nation broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").startswith("1"))
        .select("o_custkey")
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_custkey").alias("min_custkey"),
        )
        .orderBy("n_name")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT n_name, COUNT(*) AS n_customers, MIN(c_custkey) AS min_custkey
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority LIKE '1%')
GROUP BY n_name
ORDER BY n_name
"""


def suppliers_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: suppliers having at least one returned lineitem."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        s.join(l, s["s_suppkey"] == l["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    )


SUPPLIERS_WITH_RETURNS_SQL = """
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
ORDER BY s_suppkey
"""


def customer_order_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: every customer with order count/value (0 for
    order-less customers — exercises null-producing join + coalesce)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").alias("cnt"), _dsum(F.col("o_totalprice")).alias("val")
    )
    return (
        c.join(per_cust, c["c_custkey"] == per_cust["o_custkey"], "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("val"), F.lit(0.0)).alias("total_value"),
        )
        .orderBy("c_custkey")
    )


CUSTOMER_ORDER_BALANCE_SQL = """
SELECT c_custkey,
       COALESCE(cnt, 0) AS n_orders,
       COALESCE(val, 0.0) AS total_value
FROM customer
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS val
  FROM orders GROUP BY o_custkey
) ON c_custkey = o_custkey
ORDER BY c_custkey
"""


# --- rollup (grouping-sets family, free via Catalyst) ------------------------

def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


REVENUE_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (all 2^k dimension subsets in ONE pass + grouping_id) —
    rollup's big sibling; one map-side-expanded aggregate instead of
    four separate group-bys."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_items"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


REVENUE_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


def balance_quartiles_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window family depth: ntile(4) buckets + percent_rank
    over customer balances per nation (unique tie-break so the frame
    is deterministic); percent_rank's (rank-1)/(n-1) is one exact
    rational division, hash-stable cross-engine."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.select(
            "c_custkey",
            "c_nationkey",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
        )
        .filter(F.col("quartile") == 1)
        .orderBy("c_nationkey", "c_custkey")
    )


BALANCE_QUARTILES_SQL = """
SELECT c_custkey, c_nationkey, CAST(quartile AS INTEGER) AS quartile, pct_rank
FROM (
  SELECT c_custkey, c_nationkey,
         ntile(4) OVER w AS quartile,
         percent_rank() OVER w AS pct_rank
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
)
WHERE quartile = 1
ORDER BY c_nationkey, c_custkey
"""


def above_brand_average_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL layer: parts priced
    above their own brand's average. Catalyst decorrelates this into
    a brand-aggregate + equi-join (never a per-row re-scan); the
    average is the exact-decimal SUM / COUNT division from the module
    determinism rules."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT p_partkey, p_brand, p_retailprice
        FROM part_v p
        WHERE p_retailprice > (
            SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
                   / COUNT(*)
            FROM part_v p2
            WHERE p2.p_brand = p.p_brand
        )
        ORDER BY p_partkey
        """
    )


ABOVE_BRAND_AVG_SQL = """
SELECT p_partkey, p_brand, p_retailprice
FROM part p
WHERE p_retailprice > (
    SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
           / COUNT(*)
    FROM part p2
    WHERE p2.p_brand = p.p_brand
)
ORDER BY p_partkey
"""


# --- Q14: promo revenue (lineitem ⨝ part, conditional agg over a join) -------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(F.lit(0.0))
    # part is the dimension side but grows with SF — AQE decides the
    # join strategy (broadcast at test scale, shuffle at 100 TB).
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .agg(
            (
                F.lit(100.0) * _dsum(promo) / _dsum(disc)
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_items"),
        )
    )


Q14_SQL = """
SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                       THEN l_extendedprice*(1-l_discount) ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


# --- part stats (dimension-table aggregation incl. distinct-agg) --------------

def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.countDistinct("p_type").alias("n_types"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
            _dsum(F.col("p_retailprice")).alias("sum_price"),
        )
        .orderBy("p_brand")
    )


PART_BRAND_SQL = """
SELECT p_brand,
       COUNT(*) AS n_parts,
       COUNT(DISTINCT p_type) AS n_types,
       MIN(p_retailprice) AS min_price,
       MAX(p_retailprice) AS max_price,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""


# --- S7: SQL facade (the Athena replacement runs opaque SQL text) ------------

def sql_facade_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped query executed as an opaque SQL string through
    the engine's run_query facade over registered views — the exact
    usage mode of the reference's Athena layer (athena.py:16-64)."""
    from rds_to_datalake_project_spark.catalog import register_parquet_dir
    from rds_to_datalake_project_spark.sql import run_query

    register_parquet_dir(spark, sf_dir, tables=("lineitem",))
    return run_query(
        spark,
        """
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE)
                 AS forecast_revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """,
    )


SQL_FACADE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE)
         AS forecast_revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- Q7: volume shipping (two nation roles — self-join of a dim) --------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue flow NATION_1↔NATION_2 by year: nation joins BOTH sides
    (supplier's and customer's), the classic dim-role self-join."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cust_nk"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("supp_nk"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("cust_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("l_year"),
        )
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         strftime(l_shipdate, '%Y') AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --- Q10: returned-item reporting (4-way join + top-20) -----------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- range join: lineitems shipped inside promo windows -----------------------

def range_join_promo_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless point-in-interval join via the binned equi-join operator
    (operators/rangejoin.py): 3-day promo windows derived from a
    deterministic order sample, probed by every lineitem ship date."""
    from rds_to_datalake_project_spark.operators.rangejoin import range_join

    o = load_table(spark, sf_dir, "orders")
    windows = o.filter(F.col("o_orderkey") % 997 == 0).select(
        F.col("o_orderkey").alias("w_id"),
        F.col("o_orderdate").alias("w_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("w_end"),
    )
    points = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hits = range_join(points, windows, "l_shipdate", "w_start", "w_end")
    return (
        hits.groupBy("w_id")
        .agg(
            F.count("*").alias("n_shipped"),
            F.sum("l_orderkey").alias("sum_orderkey"),
        )
        .orderBy("w_id")
    )


RANGE_JOIN_SQL = """
SELECT w_id, COUNT(*) AS n_shipped, CAST(SUM(l_orderkey) AS BIGINT) AS sum_orderkey
FROM (SELECT o_orderkey AS w_id, o_orderdate AS w_start,
             o_orderdate + INTERVAL 3 DAY AS w_end
      FROM orders WHERE o_orderkey % 997 = 0) w
JOIN lineitem ON l_shipdate >= w_start AND l_shipdate < w_end
GROUP BY w_id
ORDER BY w_id
"""


# --- INTERSECT (set-op family completion) --------------------------------------

def orders_intersect_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers appearing in BOTH the urgent-order and the
    high-value-order populations (INTERSECT — distinct semantics)."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority").startswith("1")).select("o_custkey")
    high = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    return urgent.intersect(high).orderBy("o_custkey")


INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderpriority LIKE '1%'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 150000
ORDER BY o_custkey
"""


# --- holistic aggregates: exact percentiles -------------------------------------

def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (holistic) percentile aggregation — the one aggregate
    class that cannot be computed map-side-partial; Spark sorts within
    groups. Linear-interpolated like DuckDB's quantile_cont."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.25)").alias("p25"),
            F.expr("percentile(l_quantity, 0.5)").alias("median"),
            F.expr("percentile(l_quantity, 0.95)").alias("p95"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


PERCENTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.5)  AS median,
       quantile_cont(l_quantity, 0.95) AS p95,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- pivot / unpivot (wide <-> long reshaping) -------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _nation_priority_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    joined = orders.join(
        F.broadcast(cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)),
        orders.o_custkey == F.col("c_custkey"),
    )
    # pinned pivot values: no extra distinct-scan pass, stable schema
    return (
        joined.groupBy("n_name")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(_dsum(F.col("o_totalprice")))
    )


def pivot_nation_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with PINNED values (skipping Spark's extra
    distinct pass — mandatory at 100 TB) over a broadcast dim join;
    decimal-accumulated sums keep the wide cells bit-stable."""
    return _nation_priority_wide(spark, sf_dir).orderBy("n_name")


PIVOT_SQL = """
SELECT n_name,
       {cells}
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n_name
ORDER BY n_name
""".format(
    cells=",\n       ".join(
        "CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN "
        "CAST(o_totalprice AS DECIMAL(38,6)) END) AS DOUBLE) AS \"{p}\"".format(p=p)
        for p in _PRIORITIES
    )
)


def unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """melt() is pivot's inverse: reshape the wide table back to long
    and the result must equal the direct long aggregate the oracle
    states — pivot, unpivot, column naming, and null-cell semantics
    all have to agree for the hash to match."""
    wide = _nation_priority_wide(spark, sf_dir)
    long = wide.melt(
        ids=["n_name"],
        values=_PRIORITIES,
        variableColumnName="priority",
        valueColumnName="revenue",
    )
    return long.filter(F.col("revenue").isNotNull()).orderBy("n_name", "priority")


UNPIVOT_SQL = """
SELECT n_name,
       o_orderpriority AS priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n_name, o_orderpriority
ORDER BY n_name, priority
"""


QUERIES = {
    "pivot_nation_priority_revenue": pivot_nation_priority_revenue,
    "unpivot_roundtrip": unpivot_roundtrip,
    "revenue_cube": revenue_cube,
    "balance_quartiles_by_nation": balance_quartiles_by_nation,
    "above_brand_average_parts": above_brand_average_parts,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "top_customers_per_nation": top_customers_per_nation,
    "order_priority_stats": order_priority_stats,
    "orders_except_filtered": orders_except_filtered,
    "scalar_functions": scalar_functions,
    "customers_without_orders": customers_without_orders,
    "suppliers_with_returns": suppliers_with_returns,
    "customer_order_balance": customer_order_balance,
    "revenue_rollup": revenue_rollup,
    "sql_facade_forecast_revenue": sql_facade_forecast_revenue,
    "q14_promo_revenue": q14_promo_revenue,
    "part_brand_stats": part_brand_stats,
    "q7_volume_shipping": q7_volume_shipping,
    "q10_returned_items": q10_returned_items,
    "range_join_promo_windows": range_join_promo_windows,
    "orders_intersect_urgent": orders_intersect_urgent,
    "quantity_percentiles": quantity_percentiles,
}

ORACLES = {
    "pivot_nation_priority_revenue": PIVOT_SQL,
    "unpivot_roundtrip": UNPIVOT_SQL,
    "revenue_cube": REVENUE_CUBE_SQL,
    "balance_quartiles_by_nation": BALANCE_QUARTILES_SQL,
    "above_brand_average_parts": ABOVE_BRAND_AVG_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_region_revenue": Q5_SQL,
    "top_customers_per_nation": TOP_CUSTOMERS_SQL,
    "order_priority_stats": ORDER_PRIORITY_SQL,
    "orders_except_filtered": EXCEPT_SQL,
    "scalar_functions": SCALAR_SQL,
    "customers_without_orders": CUSTOMERS_WITHOUT_ORDERS_SQL,
    "suppliers_with_returns": SUPPLIERS_WITH_RETURNS_SQL,
    "customer_order_balance": CUSTOMER_ORDER_BALANCE_SQL,
    "revenue_rollup": REVENUE_ROLLUP_SQL,
    "sql_facade_forecast_revenue": SQL_FACADE_SQL,
    "q14_promo_revenue": Q14_SQL,
    "part_brand_stats": PART_BRAND_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q10_returned_items": Q10_SQL,
    "range_join_promo_windows": RANGE_JOIN_SQL,
    "orders_intersect_urgent": INTERSECT_SQL,
    "quantity_percentiles": PERCENTILES_SQL,
}
