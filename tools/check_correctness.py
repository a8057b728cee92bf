#!/usr/bin/env python
"""Local twin of the driver's correctness gate: run every declared
query on Spark AND its DuckDB oracle over the same parquet tables,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


def canon(val):
    if val is None:
        return "∅"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        # driver-style canonicalization: shortest repr
        return repr(val)
    if isinstance(val, bytes):
        return val.hex()
    return str(val)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return lines


# The driver's value hash is TYPE-SENSITIVE (r8 post-mortem: DuckDB
# HUGEINT vs Spark bigint failed hash at equal values), so beyond
# string-canonical values we require both engines to agree on a
# canonical type family per column, exact integer/float width included.
_DUCK_CANON = {
    "TINYINT": "int8", "SMALLINT": "int16", "INTEGER": "int32",
    "BIGINT": "int64", "HUGEINT": "int128!", "UHUGEINT": "uint128!",
    "UTINYINT": "uint8!", "USMALLINT": "uint16!", "UINTEGER": "uint32!",
    "UBIGINT": "uint64!", "FLOAT": "float32", "DOUBLE": "float64",
    "VARCHAR": "string", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp", "BLOB": "binary",
}
_SPARK_CANON = {
    "tinyint": "int8", "smallint": "int16", "int": "int32",
    "bigint": "int64", "float": "float32", "double": "float64",
    "string": "string", "boolean": "bool", "date": "date",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "binary": "binary",
}


def _canon_duck_type(t: str) -> str:
    t = str(t).strip().upper()
    # composite spellings: DuckDB 'BIGINT[]' ≡ Spark 'array<bigint>'
    if t.endswith("[]"):
        return f"array<{_canon_duck_type(t[:-2])}>"
    if t.startswith("DECIMAL("):
        return t.lower().replace(" ", "")  # 'DECIMAL(18, 2)'→'decimal(18,2)'
    return _DUCK_CANON.get(t, t.lower())


def _canon_spark_type(t: str) -> str:
    t = str(t).strip()
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{_canon_spark_type(t[6:-1])}>"
    return _SPARK_CANON.get(t, t)


_HASH_HOSTILE = ("int128!", "uint128!", "uint8!", "uint16!", "uint32!", "uint64!")
# raw DuckDB spellings — members of STRUCT(...)/MAP(...) never pass
# through the scalar canonicalizer, so hostile embeds are caught on
# the raw string
_HOSTILE_RAW = (
    "HUGEINT", "UHUGEINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
)


def _is_composite(t: str) -> bool:
    # Only struct/map/union spellings are exempt from strictness —
    # their renderings differ per engine even at equal types
    # ('STRUCT(a INTEGER)' vs 'struct<a:int>'). Parameterized SCALARS
    # (decimal(p,s)) stay strict: the driver hash is type-sensitive.
    t = t.lower()
    return any(tok in t for tok in ("struct", "map<", "map(", "union"))


def dtype_mismatches(s_schema, d_cols, d_types):
    """(col, spark_type, duck_type) rows whose canonical families
    differ, plus any driver-hash-hostile DuckDB types (int128 /
    unsigned, incl. embedded in composites — checked on the raw
    spelling). Arrays and decimals canonicalize; struct/map spellings
    are exempt from the strict comparison."""
    duck = {c: _canon_duck_type(t) for c, t in zip(d_cols, d_types)}
    raw = {c: str(t).upper() for c, t in zip(d_cols, d_types)}
    out = []
    for f in s_schema.fields:
        st = _canon_spark_type(f.dataType.simpleString())
        dt = duck.get(f.name)
        if dt is None:
            continue  # column-name diff is reported separately
        hostile = any(h in dt for h in _HASH_HOSTILE) or any(
            h in raw[f.name] for h in _HOSTILE_RAW
        )
        if hostile:
            out.append((f.name, st, dt))
            continue
        if _is_composite(st) or _is_composite(dt):
            continue
        if st != dt:
            out.append((f.name, st, dt))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    from rds_to_datalake_project_spark.catalog import TESTDATA_TABLES
    from rds_to_datalake_project_spark.plans.registry import ORACLES, QUERIES
    from rds_to_datalake_project_spark.session import get_spark

    spark = get_spark(app_name="check_correctness")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle — rows-only check)")
            if len(s_rows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            rel = con.sql(ORACLES[name])
            d_cols = list(rel.columns)
            d_types = [str(t) for t in rel.types]
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue

        problems = []
        bad_types = dtype_mismatches(sdf.schema, d_cols, d_types)
        if bad_types:
            problems.append(f"dtypes differ (spark, duckdb): {bad_types}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        elif len(s_rows) != len(d_rows):
            problems.append(f"row count: spark={len(s_rows)} duckdb={len(d_rows)}")
        else:
            sig_s = frame_sig(s_cols, s_rows)
            sig_d = frame_sig(d_cols, d_rows)
            if sig_s != sig_d:
                diff = [(a, b) for a, b in zip(sig_s, sig_d) if a != b][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}: {len(s_rows)} rows hash-match")

    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
