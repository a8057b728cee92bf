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
            res = con.execute(ORACLES[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue

        problems = []
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
