#!/usr/bin/env python3
"""Per-key scale exponents from two full-inventory Bench JSON lines.

Usage: exponent_table.py <bench_x10.json> <bench_x100.json>

Both files hold one Bench JSON line (possibly with surrounding log
text; the line is grepped out). Exponent convention (PLANS.md):
log10(t_hi / t_lo) for a 10x data step — <1 means sublinear. Keys are
Bench's short family ids. Times below FLOOR seconds at the LOW scale
are reported but not exponent-ranked (fixed overhead dominates; a
0.1 s -> 0.4 s move is JVM noise, not a scale law).
"""
import json
import re
import sys

FLOOR = 0.5


def load(path):
    with open(path) as f:
        text = f.read()
    m = re.search(r'\{"metric".*\}', text)
    if not m:
        sys.exit(f"no bench JSON line in {path}")
    return json.loads(m.group(0))


def main():
    lo, hi = load(sys.argv[1]), load(sys.argv[2])
    qlo, qhi = lo["queries"], hi["queries"]
    rows = []
    for k in sorted(qlo):
        if k not in qhi:
            rows.append((k, qlo[k], None, None))
            continue
        import math
        exp = math.log10(qhi[k] / qlo[k]) if qlo[k] > 0 else None
        rows.append((k, qlo[k], qhi[k], exp))
    ranked = [r for r in rows if r[3] is not None and r[1] >= FLOOR]
    ranked.sort(key=lambda r: -r[3])
    print(f"x10 total {lo['value']:.1f}s  x100 total {hi['value']:.1f}s  "
          f"ratio {hi['value']/lo['value']:.2f}  (cal x10 {lo['cal']}  x100 {hi['cal']})")
    print(f"errors x10={lo['err']} x100={hi['err']}  flaky x10={lo['flaky']} x100={hi['flaky']}")
    over = [r for r in ranked if r[3] >= 1.0]
    print(f"\n{len(ranked)} keys above {FLOOR}s floor; {len(over)} with exponent >= 1.0")
    print("\nkey      t_x10    t_x100   exponent")
    for k, tlo, thi, exp in ranked:
        flag = "  <-- SUPERLINEAR" if exp >= 1.0 else ""
        print(f"{k:8s} {tlo:7.2f}  {thi:7.2f}   {exp:5.2f}{flag}")
    small = [r for r in rows if r[3] is not None and r[1] < FLOOR and r[2] is not None and r[2] > 5.0]
    if small:
        print("\nbelow-floor keys that grew past 5s at x100 (check these):")
        for k, tlo, thi, exp in sorted(small, key=lambda r: -r[2]):
            print(f"{k:8s} {tlo:7.2f}  {thi:7.2f}   {exp:5.2f}")


if __name__ == "__main__":
    main()
