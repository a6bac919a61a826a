#!/usr/bin/env python3
"""DuckDB arm of the sf1 rehearsal (VERDICT r9 ask #8): run the same
oracle SQL the correctness gate uses, over the same 10x parquet the
Spark arm reads, timed in the same window. Driver-side tooling only.

If <sf1Dir>/spark_rows.json exists (written by graft.tools.Sf1Rehearsal),
per-query row counts are ASSERTED equal across engines — a mismatch is a
nonzero exit, not something to eyeball across two stdout streams.

Usage: python3 scripts/sf1_duckdb.py <sf1Dir> <oracle_sql.json> [runs]
"""
import json, sys, time, os
import duckdb

QUERIES = ["d19_prefix_join", "d2_ngram_jaccard", "d16_lsh_eval",
           "g1_pagerank", "c3_cluster_metrics"]
TABLES = ["documents", "lineitem", "embeddings"]


def main(sf1_dir, oracle_path, runs=3):
    oracle = json.load(open(oracle_path))
    expected = {}
    rows_path = os.path.join(sf1_dir, "spark_rows.json")
    if os.path.exists(rows_path):
        expected = json.load(open(rows_path))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf1_dir, f"{t}.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    mismatches = []
    for name in QUERIES:
        sql = oracle[name]
        ts = []
        rows = None
        for _ in range(runs):
            t0 = time.time()
            rows = len(con.execute(sql).fetchall())
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        rec = {"sf1": name, "engine": "duckdb", "rows": rows,
               "runs": [round(t, 2) for t in ts],
               "median": round(med, 2), "min": round(min(ts), 2)}
        if name in expected:
            rec["spark_rows"] = expected[name]
            rec["rows_match"] = (expected[name] == rows)
            if not rec["rows_match"]:
                mismatches.append(name)
        print(json.dumps(rec))
    if mismatches:
        print(f"ROW MISMATCH vs spark arm: {mismatches}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 3) or 0)
