"""Unified query registry — the engine's declared surface.

QUERIES: name -> (SparkSession, sf_dir) -> DataFrame
ORACLES: name -> DuckDB-compatible ANSI SQL (omitted for ops with no
         cross-engine twin; those get rows-only driver checks).
"""

from __future__ import annotations

from rds_to_datalake_project_spark.plans import (
    cdc,
    curation,
    extensions,
    relational,
    tpch_extra,
)

_MODULES = (relational, cdc, extensions, tpch_extra, curation)

QUERIES = {k: v for m in _MODULES for k, v in m.QUERIES.items()}
ORACLES = {k: v for m in _MODULES for k, v in m.ORACLES.items()}

assert set(ORACLES) <= set(QUERIES), "oracle without a query implementation"
