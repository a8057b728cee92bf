"""Advanced relational shapes the round-1 surface did not cover:
correlated scalar subqueries, two-level aggregation distributions,
disjunctive pushdown predicates, derived bridge tables, and
anti-join-with-global-aggregate — the TPC-H q8/q9/q13/q16/q17/q18/
q19/q21/q22 family, adapted to the testdata schema (which has no
partsupp table and no l_shipmode/l_commitdate/l_receiptdate columns).

The reference delegates all of this to Athena SQL (reference
athena.py:16-87); here each query is a Catalyst plan built with the
DataFrame API so pushdown/broadcast/AQE decisions are visible and
testable.

Determinism rules are the same as plans/relational.py: double sums go
through DECIMAL(38,6) and back, divisions happen once in double on
both engines, and every ORDER BY ends in a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.catalog import load_table


def _dsum(col):
    """Exact, order-independent sum of a double expression."""
    return F.sum(col.cast("decimal(38,6)")).cast("double")


# --- Q8: market share of one supplier-nation inside a region ----------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of ASIA customer revenue supplied by NATION_7, per order
    year. Two independent nation lookups (customer side and supplier
    side) — both broadcast: nation/region are fixed-size at any SF."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nat = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nat = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(cust_nat, o["o_custkey"] == cust_nat["c_custkey"])
        .join(supp_nat, l["l_suppkey"] == supp_nat["s_suppkey"])
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                _dsum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0.0)))
                / _dsum(vol)
            ).alias("mkt_share"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_7'
                          THEN l_extendedprice*(1-l_discount) ELSE 0.0 END
                     AS DECIMAL(38,6))) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS mkt_share,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region    ON cn.n_regionkey = r_regionkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN (SELECT n_nationkey AS sn_key, n_name AS supp_nation FROM nation) sn
     ON s_nationkey = sn_key
WHERE r_name = 'ASIA'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


# --- Q9: profit by supplier nation and year (adapted: retailprice cost) -----

def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier nation per order year for ECONOMY parts.
    No partsupp table in the testdata, so cost is modeled as
    10% of p_retailprice per unit — the join/agg shape (two facts,
    two dims, derived measure) is what matters."""
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supplier = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.1) * F.col("l_quantity")
    )
    return (
        l.join(part, l["l_partkey"] == part["p_partkey"])
        .join(supplier, l["l_suppkey"] == supplier["s_suppkey"])
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_dsum(profit).alias("sum_profit"), F.count("*").alias("n_lines"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l_extendedprice*(1-l_discount)
                     - p_retailprice*0.1*l_quantity AS DECIMAL(38,6))) AS DOUBLE)
         AS sum_profit,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_type = 'ECONOMY'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# --- Q13: customer order-count distribution (left join + 2-level agg) -------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed exactly N non-urgent orders —
    left outer join so zero-order customers land in the N=0 bucket,
    then a second aggregation over the counts. Both aggregations
    shuffle on their own key; the first reuses the join's
    partitioning on c_custkey (no extra exchange)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
                    AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) pc
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- Q16: supplier variety per (brand, size) via derived bridge table -------

def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers that shipped each (p_brand, p_size) — the
    partsupp bridge is derived from lineitem (distinct part-supplier
    pairs), suppliers with negative balance are excluded via an
    anti-join (Catalyst turns NOT IN over a non-null key into
    BroadcastHashJoin LeftAnti at this dim size)."""
    l = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#45")
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = l.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(bad_supp, pairs["l_suppkey"] == bad_supp["s_suppkey"], "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


# --- Q17: small-quantity orders vs per-part average (correlated scalar) -----

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems whose quantity is below 20% of the
    average quantity for their part (Brand#11 only). The correlated
    scalar subquery becomes a per-part aggregate joined back to the
    fact — one shuffle on l_partkey serves both the aggregate and
    the join, and the brand filter prunes the part scan first."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    l = load_table(spark, sf_dir, "lineitem")
    branded = l.join(part, l["l_partkey"] == part["p_partkey"]).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = branded.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (_dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty")
    )
    return (
        branded.join(avg_qty, branded["l_partkey"] == avg_qty["a_partkey"])
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


Q17_SQL = """
WITH branded AS (
    SELECT l_partkey, l_quantity, l_extendedprice
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#11'
), pavg AS (
    SELECT l_partkey AS a_partkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)/COUNT(*) AS avg_qty
    FROM branded GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)/7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM branded JOIN pavg ON l_partkey = a_partkey
WHERE l_quantity < 0.2 * avg_qty
"""


# --- Q18: large-volume orders (HAVING over a fact agg, joined back) ---------

def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 250 units, with their
    customer. The HAVING-subquery is a pre-aggregation of lineitem
    on l_orderkey; only the tiny surviving key set joins back to
    orders/customer (AQE broadcasts it)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate")).alias("o_orderdate_us"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       epoch_us(o_orderdate) AS o_orderdate_us,
       o_totalprice, total_qty
FROM (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 250
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# --- Q19: disjunctive brand/size/quantity predicates ------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three OR-ed (brand, size-range, quantity-range) branches over
    the part join. The common part of each branch (the equi-join key)
    stays a single hash join; the disjunction is a residual filter,
    and the p_size/p_brand conjuncts still push to the part scan as
    `p_size BETWEEN 1 AND 25` ∪ brand IN (...) bounds."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = l.join(p, l["l_partkey"] == p["p_partkey"])
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((brand == "Brand#12") & size.between(1, 15) & qty.between(1, 11))
        | ((brand == "Brand#23") & size.between(1, 20) & qty.between(10, 20))
        | ((brand == "Brand#34") & size.between(1, 25) & qty.between(20, 30))
    )
    return joined.filter(cond).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)
"""


# --- Q21: sole returning supplier on multi-supplier orders ------------------

def q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the only supplier with returned ('R') lines
    on an order that involved several suppliers. The EXISTS /
    NOT-EXISTS pair collapses into one aggregation over lineitem:
    per order, count distinct suppliers and distinct R-suppliers —
    a single shuffle on l_orderkey — then re-join the R lines."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    per_order = l.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    sole = per_order.filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
    r_lines = l.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    return (
        r_lines.join(sole, r_lines["l_orderkey"] == sole["g_orderkey"])
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


Q21_SQL = """
WITH per_order AS (
    SELECT l_orderkey AS g_orderkey,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_r_supp
    FROM lineitem GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM (
    SELECT DISTINCT l_orderkey, l_suppkey
    FROM lineitem
    JOIN per_order ON l_orderkey = g_orderkey
    WHERE l_returnflag = 'R' AND n_supp > 1 AND n_r_supp = 1
) sole
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --- Q22: high-balance customers with no recent orders ----------------------

def q22_inactive_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above the global average positive balance who placed
    no orders after 2000-01-01, bucketed by a derived country code.
    The global average is a scalar subquery (one tiny aggregate,
    broadcast as a literal-free cross join); the no-orders predicate
    is a left anti join on c_custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    global_avg = c.filter(F.col("c_acctbal") > 0).agg(
        (_dsum(F.col("c_acctbal")) / F.count("*")).alias("avg_bal")
    )
    rich = (
        c.crossJoin(F.broadcast(global_avg))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
    )
    return (
        rich.groupBy((F.col("c_nationkey") % 5).cast("string").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = """
SELECT CAST(c_nationkey % 5 AS VARCHAR) AS cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)/COUNT(*)
        FROM customer WHERE c_acctbal > 0
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
GROUP BY c_nationkey % 5
ORDER BY cntrycode
"""


# --- Q2: min-cost supplier per part (correlated-min → partitioned window) ----

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each SMALL part of size ≤ 10, the ASIA supplier(s) offering
    the minimum observed unit price. The testdata has no partsupp
    table, so the part-supplier bridge is derived from lineitem (min
    unit price per (part, supplier) — exact, order-independent). The
    correlated scalar subquery of the original compiles to ONE
    partitioned window min (a single hash shuffle on p_partkey) — no
    per-part recomputation, broadcastable dims."""
    from pyspark.sql import Window

    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 10)
    )
    bridge = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    eligible = (
        bridge.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .select("p_partkey", "s_name", "n_name", "s_acctbal", "cost")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(100)
    )


Q2_SQL = """
WITH bridge AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eligible AS (
  SELECT p_partkey, s_name, n_name, s_acctbal, cost,
         MIN(cost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM bridge
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  JOIN part     ON l_partkey = p_partkey
  WHERE r_name = 'ASIA' AND p_type = 'SMALL' AND p_size <= 10
)
SELECT p_partkey, s_name, n_name, s_acctbal, cost
FROM eligible WHERE cost = min_cost
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
"""


# --- Q4: order priority checking (EXISTS → left semi join) -------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders of 1997Q3 that have at least one returned lineitem
    (l_returnflag = 'R' stands in for the original's
    commitdate < receiptdate, which the testdata lacks), counted per
    priority. EXISTS compiles to a LeftSemi hash join — the build side
    is pre-filtered and deduplicated by the join itself."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        o.join(returned, o["o_orderkey"] == returned["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
  AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- Q11: important part value (global-total scalar subquery) ----------------

def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue through NATION_3 suppliers exceeds 0.1% of
    that nation's total — the original's group-vs-global-aggregate
    shape. The global total is a 1-row aggregate cross-joined as a
    broadcast (no second scan of the grouped data; the per-part agg is
    reused for both sides via one shuffle)."""
    supp3 = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_3"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (
        load_table(spark, sf_dir, "lineitem")
        .join(supp3, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(_dsum(vol).alias("part_value"))
    )
    total = per_part.agg(_dsum(F.col("part_value")).alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("total_value"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE)
           AS part_value
  FROM lineitem
  WHERE EXISTS (
          SELECT 1 FROM supplier JOIN nation ON s_nationkey = n_nationkey
          WHERE s_suppkey = l_suppkey AND n_name = 'NATION_3'
        )
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > 0.001 * (
        SELECT CAST(SUM(CAST(part_value AS DECIMAL(38,6))) AS DOUBLE) FROM per_part
      )
ORDER BY part_value DESC, l_partkey
"""


# --- Q12: shipping classes (CASE-sum pivot over a fact-fact join) ------------

def q12_shipping_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1998 shipments bucketed by discount band (stand-in for the
    missing l_shipmode), counting critical- vs normal-priority orders
    per band — the conditional-aggregation pivot of the original."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.when(F.col("l_discount") >= 0.05, F.lit("HIGH_DISC"))
            .otherwise(F.lit("LOW_DISC"))
            .alias("disc_band")
        )
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(critical, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("disc_band")
    )


Q12_SQL = """
SELECT CASE WHEN l_discount >= 0.05 THEN 'HIGH_DISC' ELSE 'LOW_DISC' END AS disc_band,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
GROUP BY CASE WHEN l_discount >= 0.05 THEN 'HIGH_DISC' ELSE 'LOW_DISC' END
ORDER BY disc_band
"""


# --- Q15: top supplier (aggregate-max scalar subquery, exact tie set) --------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum 1997Q1 revenue. The max-equality
    comparison happens on the EXACT decimal sums (cast to double only
    for output), so ties are bit-identical across engines. One shuffle
    for the per-supplier agg; the 1-row max broadcasts."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(38,6)"
            )
        ).alias("revd")
    )
    top = rev.agg(F.max("revd").alias("max_revd"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("revd") == F.col("max_revd"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("revd").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS revd
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(revd AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE revd = (SELECT MAX(revd) FROM rev)
ORDER BY s_suppkey
"""


# --- Q20: suppliers with excess shipped volume (nested agg semi-join) --------

def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5 suppliers who shipped, for some red part in 1997, more
    than 1.2× the average supplier volume of that part (stand-in for
    the original's availqty > 0.5·sum(qty); partsupp is derived from
    lineitem). Nested aggregate → one grouped agg + one partitioned
    window avg + a semi join; nothing is collected."""
    from pyspark.sql import Window

    red = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    l97 = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    ps = (
        l97.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    excess = (
        ps.withColumn("part_avg", F.avg("qty").over(w))
        .filter(F.col("qty").cast("double") > F.lit(1.2) * F.col("part_avg").cast("double"))
        .select("l_suppkey")
        .distinct()
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation5 = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    return (
        supplier.join(F.broadcast(nation5), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(38,6))) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
    AND EXISTS (SELECT 1 FROM part
                WHERE p_partkey = l_partkey AND p_name LIKE 'red%')
  GROUP BY l_partkey, l_suppkey
), excess AS (
  SELECT DISTINCT l_suppkey FROM (
    SELECT l_suppkey, CAST(qty AS DOUBLE) AS qd,
           AVG(qty) OVER (PARTITION BY l_partkey) AS part_avg
    FROM ps
  ) WHERE qd > 1.2 * CAST(part_avg AS DOUBLE)
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_5'
  AND EXISTS (SELECT 1 FROM excess WHERE excess.l_suppkey = s_suppkey)
ORDER BY s_name
"""


# --- Q6: forecasting revenue change (pure scan-predicate aggregate) --------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 adapted to the testdata date range: one global
    aggregate behind three conjunctive scan predicates. The entire
    WHERE clause must reach the parquet reader as PushedFilters (it is
    the canonical pushdown benchmark — no join, no shuffle beyond the
    single partial→final agg), which test_plan_quality pins."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1999-01-01'
  AND l_shipdate <  TIMESTAMP '2000-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in the same
    order, top 20 by support. The pair space is generated by an
    equi-join on the order key — fan-out per order is C(items, 2),
    bounded by basket size (≈4 here), NEVER a corpus cross join; the
    global top-k is one TakeOrdered, no full sort."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_orders"))
    )
    return pairs.orderBy(
        F.col("n_orders").desc(), "pa", "pb"
    ).limit(20)


COPURCHASE_SQL = """
SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_orders
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, pa, pb
LIMIT 20
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining: per-user next-event bigram counts
    (the Markov transition matrix of the event stream). ONE window
    shuffle on the user key (lead over ts) + one partial-agg count;
    ties broken by event_id so the sequence is deterministic."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("event_type").over(w)
    return (
        ev.withColumn("next_type", nxt)
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "next_type")
        .agg(F.count("*").alias("n_transitions"))
        .orderBy("from_type", "next_type")
    )


TRANSITION_SQL = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
)
SELECT from_type, next_type, COUNT(*) AS n_transitions
FROM seq WHERE next_type IS NOT NULL
GROUP BY 1, 2
ORDER BY from_type, next_type
"""


# --- PageRank over the customer↔supplier trade graph ------------------------

_PR_SCALE = 10**12
_PR_ITERS = 3
_SUPP_OFF = 1_000_000  # supplier node-id offset (disjoint from custkeys)


def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (operators/pagerank.py) on the symmetrized
    customer↔supplier graph induced by orders ⋈ lineitem. Integer
    micro-unit ranks make the iterative result bit-identical to the
    oracle's three hand-unrolled CTE iterations — a float PageRank
    could never hash-match across engines."""
    from rds_to_datalake_project_spark.operators.pagerank import pagerank

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), (F.col("s") + _SUPP_OFF).alias("dst")
    ).unionByName(
        pairs.select(
            (F.col("s") + _SUPP_OFF).alias("src"), F.col("c").alias("dst")
        )
    )
    return pagerank(edges, iters=_PR_ITERS, scale=_PR_SCALE).orderBy("node")


def _pr_iter_sql(prev: str, this: str) -> str:
    return f"""{this} AS (
  SELECT nd.node,
         CAST((SELECT (15 * {_PR_SCALE}) // (100 * n) FROM p)
              + COALESCE(s.m, 0) AS BIGINT) AS r
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, SUM((85 * r.r) // (100 * d.outdeg)) AS m
    FROM edges e JOIN {prev} r ON e.src = r.node JOIN deg d ON d.node = e.src
    GROUP BY e.dst
  ) s ON nd.node = s.node
)"""


PAGERANK_SQL = (
    f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), edges AS (
  SELECT c AS src, s + {_SUPP_OFF} AS dst FROM pairs
  UNION ALL
  SELECT s + {_SUPP_OFF} AS src, c AS dst FROM pairs
), nodes AS (
  SELECT DISTINCT src AS node FROM edges UNION SELECT dst FROM edges
), deg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1
), p AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
), r0 AS (
  SELECT node, CAST({_PR_SCALE} // n AS BIGINT) AS r FROM nodes, p
), """
    + ",\n".join(
        _pr_iter_sql(f"r{i}", f"r{i + 1}") for i in range(_PR_ITERS)
    )
    + f"""
SELECT node, r FROM r{_PR_ITERS} ORDER BY node
"""
)


QUERIES = {
    "pagerank_trade_graph": pagerank_trade_graph,
    "copurchase_part_pairs": copurchase_part_pairs,
    "event_transition_matrix": event_transition_matrix,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q11_important_part_value": q11_important_part_value,
    "q12_shipping_classes": q12_shipping_classes,
    "q15_top_supplier": q15_top_supplier,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q8_market_share": q8_market_share,
    "q9_profit_by_nation": q9_profit_by_nation,
    "q13_customer_distribution": q13_customer_distribution,
    "q16_part_supplier_variety": q16_part_supplier_variety,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q21_sole_return_supplier": q21_sole_return_supplier,
    "q22_inactive_high_balance": q22_inactive_high_balance,
}

ORACLES = {
    "pagerank_trade_graph": PAGERANK_SQL,
    "copurchase_part_pairs": COPURCHASE_SQL,
    "event_transition_matrix": TRANSITION_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q4_order_priority": Q4_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q11_important_part_value": Q11_SQL,
    "q12_shipping_classes": Q12_SQL,
    "q15_top_supplier": Q15_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q8_market_share": Q8_SQL,
    "q9_profit_by_nation": Q9_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q16_part_supplier_variety": Q16_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q18_large_volume_customers": Q18_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "q21_sole_return_supplier": Q21_SQL,
    "q22_inactive_high_balance": Q22_SQL,
}
