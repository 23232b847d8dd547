#!/usr/bin/env python3
"""Regenerate the per-query table in BASELINE.md from BENCH_DETAIL.json."""
import json, re, sys

detail = json.load(open("/root/repo/BENCH_DETAIL.json"))
qs = detail["queries"]
n = len(qs)
total = detail["total"]

rows = "\n".join(f"| `{k}` | {v:.2f} |" for k, v in sorted(qs.items()))
table = (f"### Per-query seconds (sf0.1, local[32], {n} queries, round-8 run)\n\n"
         f"| query | sec |\n|---|---|\n{rows}\n\n"
         f"Total: {total:.1f} s.\n")

src = open("/root/repo/BASELINE.md").read()
new = re.sub(r"### Per-query seconds.*", table, src, flags=re.S)
assert new != src
open("/root/repo/BASELINE.md", "w").write(new)
print(f"table regenerated: {n} queries, total {total:.1f}s")
