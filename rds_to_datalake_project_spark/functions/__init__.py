"""Scalar-function surface (SURVEY.md §2.8, F1-F12).

Most of the F-family maps 1:1 onto ``pyspark.sql.functions`` (F1
substring, F5 lpad, F6 concat_ws/split, F7 to_json/from_json, F9 cast,
F10 contains, F11 md5, F12 uuid); those need no wrappers and are
exercised by the ``scalar_functions`` plan entry. This module holds
the engine-specific composites.
"""

from rds_to_datalake_project_spark.functions.timefmt import (
    ISO_MICROS_UTC,
    commit_key_expr,
    iso_utc,
    parse_iso,
)

__all__ = ["ISO_MICROS_UTC", "commit_key_expr", "iso_utc", "parse_iso"]
