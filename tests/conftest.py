from __future__ import annotations

import os

import pytest

from rds_to_datalake_project_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = get_spark(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            # static conf: managed-table warehouse for bucketing tests
            "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("warehouse")),
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from rds_to_datalake_project_spark.catalog import register_parquet_dir

    return register_parquet_dir(spark, sf_dir)
