#!/usr/bin/env python3
"""Render the Spark-vs-DuckDB per-query comparison table (markdown) from
DUCKDB_BENCH.json (scripts/duckdb_bench.py) and bench_detail.json
(graft.Bench side file), so the README numbers are generated, not
hand-maintained.

Statistics are LIKE-FOR-LIKE (the round-6 table compared Spark min to
DuckDB median, overstating Spark): the table column and headline ratio
are median-vs-median; the min-vs-min ratio is also printed so both
consistent views are visible.

Usage: python3 scripts/bench_table.py [--top N]   (default: 12 slowest)
"""
import json, os, statistics, sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
duck = json.load(open(os.path.join(root, "DUCKDB_BENCH.json")))
spark = json.load(open(os.path.join(root, "bench_detail.json")))

top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 12

# spark medians recomputed from the raw runs with the subset size the
# artifact RECORDS (graft.Bench honors SPARK_GRAFT_BENCH_RUNS — a
# hardcoded 3 silently mis-states a different-N run); failed queries
# (any negative pass) are REPORTED, never silently dropped
n_best = spark.get("runs") or int(spark.get("stat", "median-of-best-3").rsplit("-", 1)[-1])
runs = spark["queries_runs"]
dropped = sorted(q for q, ts in runs.items() if not ts or any(t < 0 for t in ts))
s_med = {q: statistics.median(sorted(t for t in ts if t >= 0)[:n_best])
         for q, ts in runs.items() if ts and all(t >= 0 for t in ts)}
s_min = spark["queries_min"]
d_med, d_min = duck["queries"], duck.get("queries_min", duck["queries"])

common = sorted(set(d_med) & set(s_med))
only = sorted((set(d_med) ^ set(s_med)) - set(dropped))
if dropped:
    print(f"<!-- DROPPED (failed spark passes): {', '.join(dropped)} -->")
if only:
    print(f"<!-- not in both artifacts: {', '.join(only)} -->")
st_med, dt_med = sum(s_med[q] for q in common), sum(d_med[q] for q in common)
st_min = sum(s_min[q] for q in common)
dt_min = sum(d_min[q] for q in common)

print("| query | spark med (s) | duckdb med (s) | ratio |")
print("|---|---|---|---|")
ranked = sorted(common, key=lambda q: -(d_med[q] + s_med[q]))[:top]
for q in sorted(ranked):
    r = s_med[q] / d_med[q] if d_med[q] > 0 else float("inf")
    print(f"| {q} | {s_med[q]:.2f} | {d_med[q]:.2f} | {r:.2f}x |")
print(f"| **total ({len(common)} common queries)** | **{st_med:.1f}** "
      f"| **{dt_med:.1f}** | **{st_med / dt_med:.2f}x** |")
print(f"\nmin-vs-min over the same {len(common)} queries: spark {st_min:.1f}s "
      f"vs duckdb {dt_min:.1f}s = {st_min / dt_min:.2f}x")
print(f"\n<!-- generated: spark median-of-best-{n_best} from bench_detail.json "
      f"(cpus={spark.get('cpus')}, commit={spark.get('commit')}, "
      f"ts={spark.get('timestamp_utc')}), duckdb {duck.get('stat')} "
      f"v{duck.get('version')} (ts={duck.get('timestamp_utc')}), "
      f"sf={duck.get('sf')} -->",
      file=sys.stderr)
