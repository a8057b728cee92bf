"""Query plans: the engine's declared query surface (driver contract).

Each query is a (spark_fn, oracle_sql) pair registered in
plans.registry — spark_fn: (SparkSession, sf_dir) -> DataFrame, and
oracle_sql: the ANSI-SQL equivalent DuckDB runs on the same parquet
tables for the differential-correctness gate (SURVEY.md §5).
"""

from rds_to_datalake_project_spark.plans.registry import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]
