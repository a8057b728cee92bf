"""Guard against driver-hash-hostile DuckDB oracle output types.

The driver's value hash is type-sensitive through an arrow/pandas
conversion: DuckDB promotes SUM(BIGINT) to HUGEINT (int128), which
pandas renders as float64/object — so a value-identical result fails
hash_match (round-8 post-mortem: gapfill_hourly_events,
text_index_search, pagerank_trade_graph). Every oracle's FINAL
projection must therefore avoid 128-bit and unsigned integer types.

Binding a relation (`con.sql(...)`) resolves types WITHOUT executing,
so this sweeps all ~150 oracles in seconds and needs no Spark.
"""

from __future__ import annotations

import duckdb
import pytest

from rds_to_datalake_project_spark.catalog import TESTDATA_TABLES
from rds_to_datalake_project_spark.plans.registry import ORACLES

SF_DIR = "/root/testdata/sf0.001"

_BAD = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TESTDATA_TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_hash_hostile_oracle_types(con):
    offenders = {}
    for name, sql in sorted(ORACLES.items()):
        rel = con.sql(sql)  # lazy bind — resolves output types only
        flagged = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if any(b in str(t).upper() for b in _BAD)
            or str(t).upper().startswith("DECIMAL(38")
        ]
        if flagged:
            offenders[name] = flagged
    assert not offenders, (
        "oracles emit int128/unsigned columns the driver hash cannot "
        f"match — wrap in CAST(... AS BIGINT): {offenders}"
    )


def test_all_oracles_bind(con):
    """Every oracle must at least parse/bind against the base views —
    a syntax error or a reference to an unregistered table would
    otherwise first surface as a red driver row."""
    errs = {}
    for name, sql in sorted(ORACLES.items()):
        try:
            con.sql(sql)
        except Exception as e:  # noqa: BLE001
            errs[name] = f"{type(e).__name__}: {str(e)[:120]}"
    assert not errs, f"oracles fail to bind: {errs}"
