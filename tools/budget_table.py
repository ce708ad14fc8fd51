#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query budget table from two bench_last.json
captures (warmed sequential runs). Usage:
    python3 tools/budget_table.py run1.json run2.json
Prints the markdown table rows sorted by query name, plus totals."""
import json
import sys

r1 = json.load(open(sys.argv[1]))
r2 = json.load(open(sys.argv[2]))
q1, q2 = r1["queries"], r2["queries"]
assert set(q1) == set(q2), set(q1) ^ set(q2)
print(f"run walls: {r1['value']} / {r2['value']} over {len(q1)} queries")
print()
print("| query | run1 (s) | run2 (s) | budget (2x max) |")
print("|---|---|---|---|")
for q in sorted(q1):
    a, b = q1[q], q2[q]
    print(f"| {q} | {a:.2f} | {b:.2f} | {2 * max(a, b):.2f} |")
