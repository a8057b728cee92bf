#!/usr/bin/env python
"""Capture ``explain("formatted")`` for headline queries.

Writes one ``plans/r<N>/<query>_<tag>.txt`` (dir via SPARK_GRAFT_PLANS_DIR, default r13) per query so plan-shape
claims in OPTIMIZATION_r<N>.md are checkable without running Spark.
Lifecycle (PHASES) rows capture the SERVE plan (the recurring cost);
the build is a sequence of imperative commits with no single plan.

Usage:
    python tools/capture_plans.py <tag> [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    import bench
    from rds_to_datalake_project_spark.plans.registry import PHASES, QUERIES
    from rds_to_datalake_project_spark.session import get_spark

    spark = get_spark(
        app_name=f"capture_plans_{tag}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13"))
    os.makedirs(out_dir, exist_ok=True)

    # explicit names may be ANY registry query (plan evidence is not
    # limited to HEADLINE rows); no names = the whole HEADLINE set
    names = (
        [n for n in QUERIES if n in only]
        if only
        else list(bench.HEADLINE)
    )
    for name in names:
        spark.catalog.clearCache()
        try:
            if name in PHASES:
                build, serve = PHASES[name]
                handle = build(spark, sf_dir)
                df = serve(spark, sf_dir, handle)
            else:
                df = QUERIES[name](spark, sf_dir)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # capture what we can; note the failure
            plan = f"<capture failed: {type(e).__name__}: {e}>"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# {name}: {len(plan)} chars -> {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
