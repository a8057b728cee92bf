"""S4/S5 — DynamoDB-JSON decoding and manifest-driven export reads.

Wire format (reference README.rst:149-154):
``{"Item": {"account": {"S": "..."}, "amount": {"N": "592"}}}`` —
every cell is a single-entry map from type tag (S/N/BOOL/NULL/B) to a
string value. The reference decodes it row-by-row in plain Python
(lambda_functions/dynamodb_export_to_s3_post_processor_worker.py:39-56;
dynamodb_stream_consumer.py:42-59).

Engine: a fully declarative transform — parse with ``from_json`` into
``map<string, map<string,string>>`` and project typed columns with
``element_at`` + ``cast`` (F9). Whole-stage-codegen'd; no Python in
the hot path, which is what makes this viable over billions of CDC
events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# type tag -> spark cast target (None = keep string)
_TAG_CAST = {"S": None, "N": "double", "BOOL": "boolean", "B": "binary", "NULL": None}

ITEM_MAP_TYPE = "map<string, map<string,string>>"


def dynamodb_cell(item: Column, field: str, tag: str, cast: str | None = None) -> Column:
    """Extract ``Item[field][tag]`` and cast.

    ``{"N": "592"}`` numeric-in-string cells default to a caller-chosen
    cast ("int"/"bigint"/"double") — reference casts with int()
    (dynamodb_export_to_s3_post_processor_worker.py:44-45).
    """
    cell = F.element_at(F.element_at(item, field), tag)
    target = cast if cast is not None else _TAG_CAST.get(tag)
    return cell.cast(target) if target else cell


def decode_dynamodb_items(
    df: DataFrame,
    fields: dict[str, tuple[str, str | None]],
    item_col: str = "item_json",
) -> DataFrame:
    """Decode a DynamoDB-JSON string column into typed flat columns.

    ``fields`` maps output column -> (type tag, cast | None), e.g.
    ``{"account": ("S", None), "amount": ("N", "int")}``.
    Other columns of ``df`` pass through untouched.
    """
    parsed = F.from_json(F.col(item_col), f"struct<Item:{ITEM_MAP_TYPE}>")["Item"]
    cols = [c for c in df.columns if c != item_col]
    projected = [
        dynamodb_cell(parsed, name, tag, cast).alias(name)
        for name, (tag, cast) in fields.items()
    ]
    return df.select(*cols, *projected)


def read_manifest_export(
    spark: SparkSession,
    manifest_files_path: str,
    data_key_col: str = "dataFileS3Key",
    base_dir: str = "",
) -> DataFrame:
    """S5 — expand ``manifest-files.json`` into a unified items read.

    Reference: vendor/aws_dynamodb_export_to_s3.py:348-391 iterates the
    manifest's data-file list and streams each file. Engine: read the
    manifest (tiny, driver-collects the key list), then one distributed
    ``spark.read.json`` over all data files.
    """
    manifest = spark.read.json(manifest_files_path)
    keys = [r[0] for r in manifest.select(data_key_col).collect()]
    paths = [base_dir + k if base_dir else k for k in keys]
    if not paths:
        raise ValueError(f"manifest {manifest_files_path} lists no data files")
    return spark.read.text(paths).withColumnRenamed("value", "item_json")
