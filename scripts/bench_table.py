#!/usr/bin/env python3
"""Render the Spark-vs-DuckDB per-query comparison table (markdown) from
DUCKDB_BENCH.json (scripts/duckdb_bench.py) and bench_detail.json
(graft.Bench side file), so the README numbers are generated, not
hand-maintained.

Usage: python3 scripts/bench_table.py [--top N]   (default: 12 slowest)
"""
import json, os, sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
duck = json.load(open(os.path.join(root, "DUCKDB_BENCH.json")))
spark = json.load(open(os.path.join(root, "bench_detail.json")))

top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 12
dq, sq = duck["queries"], spark["queries_min"]
common = sorted(set(dq) & set(sq))
st, dt = sum(sq[q] for q in common), sum(dq[q] for q in common)

print(f"| query | spark (s) | duckdb (s) | ratio |")
print(f"|---|---|---|---|")
ranked = sorted(common, key=lambda q: -(dq[q] + sq[q]))[:top]
for q in sorted(ranked):
    r = sq[q] / dq[q] if dq[q] > 0 else float("inf")
    print(f"| {q} | {sq[q]:.2f} | {dq[q]:.2f} | {r:.2f}x |")
print(f"| **total ({len(common)} common queries)** | **{st:.1f}** | **{dt:.1f}** "
      f"| **{st / dt:.2f}x** |")
print(f"\n<!-- generated: spark min-of-runs from bench_detail.json "
      f"({spark.get('stat')}, cpus={spark.get('cpus')}), duckdb "
      f"{duck.get('stat')} v{duck.get('version')}, sf={duck.get('sf')} -->",
      file=sys.stderr)
