"""Unified query registry — the engine's declared surface.

QUERIES: name -> (SparkSession, sf_dir) -> DataFrame
ORACLES: name -> DuckDB-compatible ANSI SQL (omitted for ops with no
         cross-engine twin; those get rows-only driver checks).
"""

from __future__ import annotations

from rds_to_datalake_project_spark.plans import cdc, extensions, relational, tpch_extra

QUERIES = {**relational.QUERIES, **cdc.QUERIES, **extensions.QUERIES, **tpch_extra.QUERIES}
ORACLES = {**relational.ORACLES, **cdc.ORACLES, **extensions.ORACLES, **tpch_extra.ORACLES}

assert set(ORACLES) <= set(QUERIES), "oracle without a query implementation"
