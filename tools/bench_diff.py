#!/usr/bin/env python
"""Compare two bench stderr logs (`# name: N rows in S s (build b, serve s)`).

Usage: python tools/bench_diff.py before.log after.log [--sort ratio|delta]
"""

from __future__ import annotations

import re
import sys

_LINE = re.compile(
    r"^# (\S+): \d+ rows in ([0-9.]+)s"
    r"(?: \(build ([0-9.]+)s, serve ([0-9.]+)s\))?"
)


def parse(path: str) -> dict[str, tuple[float, float | None, float | None]]:
    out = {}
    for line in open(path, errors="replace"):
        m = _LINE.match(line.strip())
        if m:
            out[m.group(1)] = (
                float(m.group(2)),
                float(m.group(3)) if m.group(3) else None,
                float(m.group(4)) if m.group(4) else None,
            )
    return out


def main() -> int:
    a, b = parse(sys.argv[1]), parse(sys.argv[2])
    common = [k for k in a if k in b]
    rows = []
    for k in common:
        ta, tb = a[k][0], b[k][0]
        rows.append((k, ta, tb, tb - ta, tb / ta if ta else float("inf")))
    sort_key = "delta" if "--sort" not in sys.argv else sys.argv[
        sys.argv.index("--sort") + 1]
    rows.sort(key=lambda r: r[3] if sort_key == "delta" else r[4])
    print(f"{'query':42s} {'before':>8s} {'after':>8s} {'delta':>8s} {'ratio':>6s}")
    for k, ta, tb, d, r in rows:
        print(f"{k:42s} {ta:8.3f} {tb:8.3f} {d:+8.3f} {r:6.2f}")
    sa, sb = sum(a[k][0] for k in common), sum(b[k][0] for k in common)
    print(f"{'COMMON-SET TOTAL':42s} {sa:8.3f} {sb:8.3f} {sb-sa:+8.3f} {sb/sa:6.2f}")
    only_a = [k for k in a if k not in b]
    only_b = [k for k in b if k not in a]
    if only_a:
        print("only in before:", ", ".join(only_a))
    if only_b:
        print("only in after:", ", ".join(only_b))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
