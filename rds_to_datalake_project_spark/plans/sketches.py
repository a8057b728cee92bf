"""Sketch-layer driver queries: HLL registers / estimate, CMS heavy
hitters, and the maintained-sidecar lifecycle — each with a DuckDB
oracle twin that recomputes the SAME deterministic sketch from
scratch in SQL (md5 hash family; see operators/sketch.py for why the
sketch math is integer-exact and therefore hash-checkable across
engines).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.catalog import load_table
from rds_to_datalake_project_spark.operators.sketch import (
    _HASH_BITS,
    attach_sketch_maintenance,
    cms_counters,
    cms_point_estimates,
    hll_estimate,
    hll_registers,
    read_sketches,
)

P = 12
M = 1 << P
K = _HASH_BITS - P  # 48
T_SCALE = 1 << (K + 1)
ALPHA_NUM = 0.7213 / (1.0 + 1.079 / M) * M * M * float(T_SCALE)
CMS_DEPTH = 4
CMS_WIDTH = 1024

# DuckDB fragment: the 60-bit md5 hash of an expression's string form
_H60 = "CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"

_HLL_REGS_CTE = f"""
WITH h AS (
  SELECT {_H60.format(expr="CAST(user_id AS VARCHAR)")} AS h60
  FROM events WHERE user_id IS NOT NULL
), r AS (
  SELECT CAST(h60 % {M} AS INTEGER) AS bucket,
         CAST(CASE WHEN h60 // {M} = 0 THEN {K + 1}
                   ELSE {K} - length(bin(h60 // {M})) + 1 END AS INTEGER) AS rho
  FROM h
), regs AS (
  SELECT bucket, MAX(rho) AS rho FROM r GROUP BY bucket
)
"""


def hll_registers_users_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL register table itself over ``events.user_id`` — the
    mergeable artifact a 100-TB NDV service persists per table/day.
    Hash-checking the registers (not just the estimate) pins the
    entire hash → bucket → rho pipeline."""
    ev = load_table(spark, sf_dir, "events")
    return hll_registers(ev, "user_id", p=P, hash_mode="md5").orderBy("bucket")


HLL_REGISTERS_SQL = _HLL_REGS_CTE + """
SELECT bucket, rho FROM regs ORDER BY bucket
"""


def hll_estimate_users_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bias-corrected cardinality estimate from the register table —
    one row, integer-exact harmonic sum, bit-stable across engines."""
    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(ev, "user_id", p=P, hash_mode="md5")
    return hll_estimate(regs, p=P)


HLL_ESTIMATE_SQL = _HLL_REGS_CTE + f"""
, agg AS (
  SELECT CAST(COUNT(*) AS INTEGER) AS nb,
         SUM(1::BIGINT << ({K + 1} - rho)) AS s_ne
  FROM regs
), est AS (
  SELECT nb,
         CAST({M} - nb AS INTEGER) AS empty,
         COALESCE(s_ne, 0) + CAST({M} - nb AS BIGINT) * {T_SCALE} AS s_int
  FROM agg
)
SELECT CAST(FLOOR(
         CASE WHEN ({ALPHA_NUM!r} / CAST(s_int AS DOUBLE)) <= {2.5 * M!r}
                   AND empty > 0
              THEN {float(M)!r} * ln({float(M)!r} / CAST(empty AS DOUBLE))
              ELSE {ALPHA_NUM!r} / CAST(s_int AS DOUBLE) END
       + 0.5) AS BIGINT) AS est_distinct,
       nb AS n_buckets,
       empty AS empty_buckets
FROM est
"""


def cms_heavy_hitters_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS point estimates for a deterministic probe set (every 5th
    user id): build the ``depth×width`` counter table in one scan,
    probe it with an equi-join — the 100-TB hot-key query that never
    re-reads the corpus."""
    ev = load_table(spark, sf_dir, "events")
    cms = cms_counters(ev, "user_id", depth=CMS_DEPTH, width=CMS_WIDTH, hash_mode="md5")
    probes = ev.filter(F.col("user_id") % 5 == 0).select("user_id")
    est = cms_point_estimates(
        cms, probes, "user_id", depth=CMS_DEPTH, width=CMS_WIDTH, hash_mode="md5"
    )
    return est.select(
        F.col("user_id").cast("long").alias("user_id"), "est_count"
    ).orderBy("user_id")


CMS_HEAVY_HITTERS_SQL = f"""
WITH items AS (
  SELECT CAST(user_id AS VARCHAR) AS v FROM events WHERE user_id IS NOT NULL
), ex AS (
  SELECT t.j AS row, v FROM items, range({CMS_DEPTH}) t(j)
), c AS (
  SELECT row,
         CAST({_H60.format(expr="CAST(row AS VARCHAR) || '|' || v")} % {CMS_WIDTH}
              AS INTEGER) AS bucket,
         COUNT(*) AS cnt
  FROM ex GROUP BY 1, 2
), probes AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS v
  FROM events WHERE user_id % 5 = 0
), pex AS (
  SELECT v,
         t.j AS row,
         CAST({_H60.format(expr="CAST(t.j AS VARCHAR) || '|' || v")} % {CMS_WIDTH}
              AS INTEGER) AS bucket
  FROM probes, range({CMS_DEPTH}) t(j)
)
SELECT CAST(p.v AS BIGINT) AS user_id,
       MIN(COALESCE(c.cnt, 0)) AS est_count
FROM pex p LEFT JOIN c ON p.row = c.row AND p.bucket = c.bucket
GROUP BY 1 ORDER BY user_id
"""


def _scratch(name: str) -> str:
    # Per-PID root: two engine processes (a bench and a correctness
    # sweep) sharing one scratch dir would delete each other's live
    # fixtures mid-read — an orchestration-only hazard, but a real one.
    root = os.path.join(
        tempfile.gettempdir(), f"sg_scratch_{os.getpid()}", name
    )
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    return root


def sketch_cms_after_cdc_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained-sidecar lifecycle: load an orders table with the
    sketch service attached, upsert a CDC batch that REMAPS a third of
    the custkeys, and read back the CMS counter table the incremental
    (turnstile) refresh produced. The oracle rebuilds the sketch from
    the FINAL table state from scratch — so the row equals the
    incremental path only because −pre/+post deltas are exact."""
    from rds_to_datalake_project_spark.operators.upsert import KeyedTable
    from rds_to_datalake_project_spark.schema import TableSpec

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.lit(0).cast("long").alias("seq")
    )
    spec = TableSpec(
        "orders_sketch",
        record_key=("o_orderkey",),
        precombine_key="seq",
        partition_granularity=None,
    )
    t = KeyedTable(
        spark, _scratch("sketch_cdc") + "/t", spec, retain_versions=4
    )
    attach_sketch_maintenance(
        t, "o_custkey", p=P, depth=CMS_DEPTH, width=CMS_WIDTH, hash_mode="md5"
    )
    t.initial_load(orders)
    batch = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_custkey", F.col("o_custkey") % 100)
        .withColumn("seq", F.lit(1).cast("long"))
        .withColumn("Op", F.lit("U"))
    )
    t.upsert(batch)
    got = read_sketches(t)
    assert got is not None, "sketch sidecar missing after maintained commits"
    _, cms = got
    return cms.orderBy("row", "bucket")


SKETCH_CMS_AFTER_CDC_SQL = f"""
WITH final_state AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN o_custkey % 100
              ELSE o_custkey END AS o_custkey
  FROM orders
), items AS (
  SELECT CAST(o_custkey AS VARCHAR) AS v FROM final_state
  WHERE o_custkey IS NOT NULL
), ex AS (
  SELECT t.j AS row, v FROM items, range({CMS_DEPTH}) t(j)
)
SELECT CAST(row AS INTEGER) AS row,
       CAST({_H60.format(expr="CAST(row AS VARCHAR) || '|' || v")} % {CMS_WIDTH}
            AS INTEGER) AS bucket,
       COUNT(*) AS cnt
FROM ex GROUP BY 1, 2
ORDER BY row, bucket
"""


QUERIES = {
    "hll_registers_users_md5": hll_registers_users_md5,
    "hll_estimate_users_md5": hll_estimate_users_md5,
    "cms_heavy_hitters_md5": cms_heavy_hitters_md5,
    "sketch_cms_after_cdc_md5": sketch_cms_after_cdc_md5,
}

ORACLES = {
    "hll_registers_users_md5": HLL_REGISTERS_SQL,
    "hll_estimate_users_md5": HLL_ESTIMATE_SQL,
    "cms_heavy_hitters_md5": CMS_HEAVY_HITTERS_SQL,
    "sketch_cms_after_cdc_md5": SKETCH_CMS_AFTER_CDC_SQL,
}
