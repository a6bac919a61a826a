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
           "g1_pagerank", "c3_cluster_metrics", "g7_kcore", "g8_harmonic",
           "g4_bfs", "g5_label_prop", "v8_pq_adc", "v9_pq_rot", "v14_ivfpq",
           "d8_dup_clusters", "d12_cluster_keepers",
           "t17_tfidf_pairs", "t20_source_overlap", "t23_pmi_collocations"]
TABLES = ["documents", "lineitem", "embeddings"]

# Queries whose part-id density cap is corpus-proportional: the Spark arm
# scales it via -Dgraft.graph.capScale=k (see GraphOps.capScale — BOTH
# edge builders honor it), so the oracle SQL gets the same literal
# rewrite — without it the id remap p -> p*k + copy would shrink the
# capped subgraph k-fold on both arms and the rehearsal would measure
# nothing. Map value = that query's cap base literal (coPurchaseEdges
# family = 3000, coPurchaseEdgesP family g3/g10 = 4000).
CAP_SCALED = {"g7_kcore": 3000, "g8_harmonic": 3000, "g5_label_prop": 3000,
              "g3_triangles": 4000, "g10_clustering_coeff": 4000}


def main(sf1_dir, oracle_path, runs=3, k=10, only=None):
    if only is not None:
        unknown = set(only) - set(QUERIES)
        assert not unknown, (
            f"unknown rehearsal queries: {sorted(unknown)} — a typo here "
            f"would run NOTHING and exit 0 (known: {QUERIES})")
    queries = [q for q in QUERIES if only is None or q in only]
    oracle = json.load(open(oracle_path))
    expected = {}
    rows_path = os.path.join(sf1_dir + "-harness", "spark_rows.json")
    if os.path.exists(rows_path):
        expected = json.load(open(rows_path))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf1_dir, f"{t}.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    mismatches = []
    import glob
    import pandas as pd

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    for name in queries:
        sql = oracle[name]
        if name in CAP_SCALED:
            base = CAP_SCALED[name]
            want = f"l_partkey < {base}"
            assert want in sql, f"{name}: expected cap literal '{want}' in oracle SQL"
            sql = sql.replace(want, f"l_partkey < {base * k}")
        else:
            # classify-or-fail: a rehearsal query with an UNREGISTERED cap
            # literal would silently run the k-fold-shrunk subgraph — the
            # exact trap CAP_SCALED exists to prevent
            assert "l_partkey <" not in sql, (
                f"{name}: oracle SQL has a part-id cap literal but the query "
                f"is not registered in CAP_SCALED — add it with its base")
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
        # full VALUE compare against the Spark arm's untimed result dump
        # (dev_check idiom): sorted columns, sorted rows, str-compare
        spark_files = sorted(glob.glob(
            os.path.join(sf1_dir + "-harness", "results", name, "*.parquet")))
        if not spark_files:
            # the Spark arm dumps every query it timed — a missing dump
            # (including results/ absent entirely, e.g. a pre-dump
            # rehearsal dir) means mismatched arms; silently skipping
            # would let the "values verified" claim go vacuous
            mismatches.append(name + " (missing spark value dump)")
        if spark_files:
            got = norm(pd.concat([pd.read_parquet(f) for f in spark_files]))
            want = norm(con.execute(sql).df())
            ok = (list(got.columns) == list(want.columns)
                  and len(got) == len(want)
                  and got.astype(str).values.tolist()
                      == want.astype(str).values.tolist())
            rec["values_match"] = ok
            if not ok:
                mismatches.append(name + " (values)")
        print(json.dumps(rec))
    if mismatches:
        print(f"ROW MISMATCH vs spark arm: {mismatches}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 3,
                  int(sys.argv[4]) if len(sys.argv) > 4 else 10,
                  set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None) or 0)
