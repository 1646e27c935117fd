#!/usr/bin/env python3
"""Regenerate SCALING.md's per-query table from three Sweep logs.

Usage: scaling_table.py <sweep_sf0.001> <sweep_sf0.01> <sweep_sf0.1>
Prints the markdown table (sorted by 0.01->0.1 ratio, worst first) to
stdout; the headline prose above it is written by hand from the numbers.
"""
import re
import sys


def parse(path):
    out = {}
    for line in open(path):
        m = re.match(r"SWEEP (\S+)\s+([0-9.]+) s", line)
        if m and m.group(1) not in ("TOTAL", "COVERAGE"):
            out[m.group(1)] = float(m.group(2))
    return out


def main():
    a, b, c = (parse(p) for p in sys.argv[1:4])
    names = sorted(set(a) & set(b) & set(c))
    missing = sorted((set(a) | set(b) | set(c)) - set(names))
    if missing:
        print(f"WARNING missing from some SF: {missing}", file=sys.stderr)
    rows = []
    for n in names:
        ratio = c[n] / b[n] if b[n] > 0 else float("inf")
        rows.append((n, a[n], b[n], c[n], ratio))
    rows.sort(key=lambda r: -r[4])
    print("| query | sf0.001 | sf0.01 | sf0.1 | 0.01→0.1 |")
    print("|---|---|---|---|---|")
    for n, x, y, z, r in rows:
        print(f"| {n} | {x:.3f} | {y:.3f} | {z:.3f} | {r:.2f}× |")
    print(f"\nrows: {len(rows)}", file=sys.stderr)


if __name__ == "__main__":
    main()
