"""Property-based test of the secondary RANGE index
(operators/secondary_index.py RANGE layout): for ANY value
distribution — negatives, huge magnitudes, duplicates, constants —
and ANY probe bounds (inside, straddling, or outside the built
domain), the band-pruned lookup must equal the plain BETWEEN filter.

This pins the clamp/monotonicity argument the layout rests on: the
affine banding is frozen at build time, out-of-domain refresh values
clamp to the edge bands, and a probe's band interval [band(lo),
band(hi)] is conservative because double conversion, subtraction,
division by a positive width, and floor are all monotone
non-decreasing."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.secondary_index import (
    build_secondary_range_index,
    refresh_secondary_range_index,
    secondary_range_lookup,
)
from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)
values_strategy = st.lists(finite, min_size=1, max_size=30)
# second wave lands through refresh under the FROZEN params —
# deliberately allowed to fall outside the built domain
delta_strategy = st.lists(finite, min_size=0, max_size=10)
bounds_strategy = st.tuples(finite, finite).map(lambda t: (min(t), max(t)))


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=values_strategy, delta=delta_strategy, bounds=bounds_strategy)
@pytest.mark.slow
def test_range_lookup_equals_plain_between(
    spark, tmp_path_factory, values, delta, bounds
):
    lo, hi = bounds
    tmp = tmp_path_factory.mktemp("rng_prop")
    spec = TableSpec(
        "t", record_key=("k",), precombine_key="seq",
        partition_granularity=None,
    )
    t = KeyedTable(spark, str(tmp / "t"), spec, retain_versions=4)
    t.initial_load(
        spark.createDataFrame(
            [(i, float(v), 0) for i, v in enumerate(values)],
            "k long, payload double, seq long",
        )
    )
    build_secondary_range_index(t, "payload", n_bands=8)
    if delta:
        t.upsert(
            spark.createDataFrame(
                [(1000 + i, float(v), 1) for i, v in enumerate(delta)],
                "k long, payload double, seq long",
            ).withColumn("Op", F.lit("U"))
        )
        assert refresh_secondary_range_index(t, "payload") == "incremental"
    got = {
        r["k"] for r in secondary_range_lookup(t, "payload", lo, hi).collect()
    }
    want = {
        r["k"]
        for r in t.read().filter(F.col("payload").between(lo, hi)).collect()
    }
    assert got == want
