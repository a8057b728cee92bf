"""rds_to_datalake_project_spark — a PySpark-native CDC lake engine.

A from-scratch re-expression of the capabilities of
``MacHu-GWU/rds_to_datalake-project`` (reference at ``/root/reference``,
surveyed in ``SURVEY.md``) as an idiomatic PySpark library:

- snapshot + CDC parquet/JSON sources      (reference: glue_jobs/*.py)
- keyed upsert lake tables with precombine (reference: Hudi options,
  glue_jobs/initial_load.py:160-183)
- latest-version-per-key dedup             (reference: glue_jobs/incremental.py:172-183)
- partition enrichment                     (reference: glue_jobs/initial_load.py:127-150)
- micro-batch orchestration + streaming    (reference: rds_to_datalake/incremental_load_orchestration.py)
- SQL facade + differential comparator     (reference: rds_to_datalake/athena.py, compare.py)
- 100TB-scale extension operators: dedup (exact/MinHash-LSH/SimHash),
  similarity search, text analysis, multimodal column plumbing.

Everything is declared via the DataFrame API so Catalyst handles
predicate pushdown, column pruning, join strategy, and AQE handles
runtime re-planning. No RDDs; Python UDFs only where the built-in
operators genuinely cannot express the semantics (Arrow-batched).
"""

from rds_to_datalake_project_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
