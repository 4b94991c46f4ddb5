"""Compare two bench.py outputs (or driver BENCH_r{N}.json files) and
report per-query regressions/improvements.

Usage: python tools/diff_bench.py OLD.json NEW.json [threshold=1.3]

Accepts either the raw one-line bench output or the driver's wrapper
format ({"parsed": {...}}). Exit code 1 when any common query regressed
beyond the threshold (with a 50 ms absolute floor so noise on sub-100ms
queries doesn't flag).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    return d.get("parsed", d)


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    t_old = sum(oq[k] for k in common)
    t_new = sum(nq[k] for k in common)
    print(f"common {len(common)} queries: {t_old:.2f}s -> {t_new:.2f}s "
          f"({t_new / t_old:.2f}x)")
    added = sorted(set(nq) - set(oq))
    if added:
        print(f"new queries (+{sum(nq[k] for k in added):.2f}s): {', '.join(added)}")
    bad = []
    for k in common:
        if nq[k] > oq[k] * thr + 0.05:
            bad.append((k, oq[k], nq[k]))
    for k, a, b in sorted(bad, key=lambda x: -(x[2] - x[1])):
        print(f"  REGRESSED {k}: {a:.3f}s -> {b:.3f}s ({b / a:.2f}x)")
    if not bad:
        print("no regressions beyond threshold")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
