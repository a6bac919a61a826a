#!/usr/bin/env python3
"""Per-query DuckDB baseline timing — the same-host, same-data companion to
graft.Bench, so bench-vs-baseline is computable PER QUERY per round instead
of from prose.

Usage: python3 scripts/duckdb_bench.py <sfDir> <oracle_sql.json> [runs]

Runs every oracle SQL from a Verify dump's oracle_sql.json against <sfDir>'s
parquet tables in DuckDB (all cores), <runs> timed passes after one untimed
warmup, and writes DUCKDB_BENCH.json next to the repo root:

  {"engine":"duckdb","version":...,"sf":...,"stat":"median-of-N",
   "total":sec,"queries":{name:median_sec,...},"queries_min":{...}}

Driver-side tooling only (duckdb is not on the Spark classpath and is not
part of the library).
"""
import json, os, statistics, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def main(sf_dir, oracle_path, runs=3):
    con = connect(sf_dir)
    oracle = json.load(open(oracle_path))
    medians, mins, failed = {}, {}, []

    def timed(con, sql):
        con.execute(sql).fetchall()  # warmup (plans, buffer pool)
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            ts.append(time.perf_counter() - t0)
        return ts

    for name, sql in sorted(oracle.items()):
        try:
            try:
                ts = timed(con, sql)
            except Exception:
                # a wedged/OOM'd connection poisons every later query —
                # reconnect once and retry before declaring failure
                con = connect(sf_dir)
                ts = timed(con, sql)
            medians[name] = round(statistics.median(ts), 3)
            mins[name] = round(min(ts), 3)
            print(f"{name}: median {medians[name]}s min {mins[name]}s", file=sys.stderr)
        except Exception as e:
            failed.append(name)
            print(f"{name}: FAILED {e}", file=sys.stderr)
            con = connect(sf_dir)
    out = {
        "engine": "duckdb", "version": duckdb.__version__, "sf": sf_dir,
        "stat": f"median-of-{runs}", "total": round(sum(medians.values()), 3),
        "n_queries": len(medians), "failed": failed,
        "queries": medians, "queries_min": mins,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "DUCKDB_BENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in ("engine", "version", "sf", "total", "n_queries")}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3))
