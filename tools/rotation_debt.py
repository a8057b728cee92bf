#!/usr/bin/env python
"""Compute the correctness-window rotation worklist.

Scans every ``CORRECTNESS_r*.json`` at the repo root and reports, for
each ORACLED query in the registry, the newest round with a fully
green driver row (rows + schema + hash).  Queries that have NEVER held
a green driver row are treated as infinitely stale (last_green = 0) so
they always sort to the head of the worklist — r11 VERDICT "What's
missing" #1 found that keying the worklist on "last green <= rN" let a
never-green query slip past the sweep for eleven rounds.

Usage:
    python tools/rotation_debt.py [--max-round N]

Prints one line per query, oldest-first:  <last_green_round> <name>
Queries already inside the current _PRIORITY window are marked.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rds_to_datalake_project_spark.plans import registry  # noqa: E402


def last_green_rounds(repo_root: str) -> dict[str, int]:
    """name -> newest round with a green (rows+schema+hash) driver row."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            report = json.load(f)
        for name, row in report.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if green:
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--max-round",
        type=int,
        default=None,
        help="only list queries whose last green is <= N (never-green always listed)",
    )
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    greens = last_green_rounds(repo_root)
    window = set(registry._PRIORITY)

    rows = []
    for name in registry.ORACLES:
        last = greens.get(name, 0)  # never-green -> 0 -> infinitely stale
        if args.max_round is not None and last > args.max_round:
            continue
        rows.append((last, name))
    rows.sort()

    for last, name in rows:
        tag = " [in-window]" if name in window else ""
        label = "never" if last == 0 else f"r{last}"
        print(f"{label:>6} {name}{tag}")

    stale = [n for last, n in rows if n not in window]
    print(
        f"\n{len(rows)} listed, {len(stale)} outside the current window",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
