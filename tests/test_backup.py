"""Verified snapshot export / import (operators/backup.py)."""

from __future__ import annotations

import pytest

from rds_to_datalake_project_spark.operators.backup import (
    export_snapshot,
    import_snapshot,
)
from rds_to_datalake_project_spark.operators.compare import compare_tables
from rds_to_datalake_project_spark.operators.upsert import KeyedTable

from tests.test_scd import B1, SPEC, V0, _mk_base
from tests.test_crash_recovery import BATCH_COLS


def test_export_import_roundtrip(spark, tmp_path):
    t = _mk_base(spark, tmp_path)
    t.upsert(spark.createDataFrame(B1, BATCH_COLS), delete_mode="apply")
    m = export_snapshot(t, str(tmp_path / "snap"))
    assert sum(s["n_rows"] for s in m["slices"]) == t.read().count()

    t2 = import_snapshot(
        spark, str(tmp_path / "snap"), SPEC, str(tmp_path / "restored")
    )
    res = compare_tables(t.read(), t2.read(), keys=["id"])
    assert res.equal


@pytest.mark.slow
def test_export_as_of_version(spark, tmp_path):
    t = _mk_base(spark, tmp_path)
    t.upsert(spark.createDataFrame(B1, BATCH_COLS), delete_mode="apply")
    export_snapshot(t, str(tmp_path / "snap0"), version=0)
    t0 = import_snapshot(
        spark, str(tmp_path / "snap0"), SPEC, str(tmp_path / "restored0")
    )
    assert compare_tables(t.read_as_of(0), t0.read(), keys=["id"]).equal


def test_import_refuses_tampered_export(spark, tmp_path):
    import glob
    import os

    t = _mk_base(spark, tmp_path)
    export_snapshot(t, str(tmp_path / "snap"))
    # tamper: drop one data file
    victim = sorted(glob.glob(str(tmp_path / "snap" / "data" / "*.parquet")))[0]
    os.remove(victim)
    with pytest.raises(ValueError, match="verification failed|column mismatch"):
        import_snapshot(
            spark, str(tmp_path / "snap"), SPEC, str(tmp_path / "restored")
        )
    # nothing half-loaded
    assert not os.path.exists(str(tmp_path / "restored"))


def test_import_refuses_missing_manifest(spark, tmp_path):
    t = _mk_base(spark, tmp_path)
    t.read().write.parquet(str(tmp_path / "bare" / "data"))
    with pytest.raises(ValueError, match="manifest"):
        import_snapshot(
            spark, str(tmp_path / "bare"), SPEC, str(tmp_path / "restored")
        )
