"""Tiny literal frames as pure-JVM plans.

``spark.createDataFrame(python_list)`` is RDD-backed: EVERY action on
the frame — or on any larger plan that contains it — spins a Python
worker to re-pickle the rows (guide §4 "the Python boundary"; the r12
optimization log measured 0.6-0.7 s steady-state for a 5-row frame's
bare collect vs 0.14-0.16 s for a JVM relation). Facade verb results,
sidecar codebook parts and fixture micro-batches don't need an RDD:
build them IN-PLAN over ``spark.range(n)`` with per-column literal
arrays — whole-stage codegen, zero Python workers, and a relation
Catalyst can see through (same pattern as
``bloomfilter._probe_relation``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Past this many literals the plan itself becomes the cost (Catalyst
# analysis is O(plan size) — the r12 log measured seconds of planning
# at ~1k-literal-per-value shapes); large frames keep the RDD path,
# whose per-action cost is amortized by real data volume anyway.
_MAX_LITERALS = 20_000


def literal_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for SMALL row lists,
    built as a JVM-only plan (``range(n)`` + literal-array
    ``element_at``) instead of a Python RDD. Accepts tuples/Rows and a
    DDL string or StructType; values must be plain literals (None,
    bool, int, float, str, bytes, datetime/date, Decimal, flat lists)
    — exactly what the engine's status/result frames carry. Falls back
    to ``createDataFrame`` for big inputs."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    rows = list(rows)
    if not rows:
        return spark.range(0).select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )
    if len(rows) * len(schema.fields) > _MAX_LITERALS:
        return spark.createDataFrame(rows, schema)
    idx = (F.col("id") + 1).cast("int")
    cols = []
    for i, f in enumerate(schema.fields):
        vals = [F.lit(r[i]).cast(f.dataType) for r in rows]
        cols.append(F.element_at(F.array(*vals), idx).alias(f.name))
    return spark.range(len(rows)).select(*cols)


def widen_if_narrow(rows: DataFrame, min_ratio: float = 0.5) -> DataFrame:
    """Round-robin repartition a COMPUTE-HEAVY input up to the
    session's parallelism — only when its scan is narrower than
    ``min_ratio`` of it. A compacted corpus reads as 1-2 splits, which
    serializes per-row-expensive maps (the ×num_hashes seeded minhash
    signature ran as ONE single-task 12 s job on local[32] — guide
    §2.5 "input skew: repartition immediately after the read"). At
    scale the input already carries enough splits and the payload
    shuffle would be pure cost, so wide inputs pass through untouched
    (guide §2.2: don't add shuffles that move opaque payloads). Row
    set unchanged — placement only."""
    sc = rows.sparkSession.sparkContext
    want = sc.defaultParallelism
    try:
        have = rows.rdd.getNumPartitions()
    except Exception:
        return rows
    if have >= max(1, int(want * min_ratio)):
        return rows
    return rows.repartition(want)
