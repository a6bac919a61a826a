#!/usr/bin/env python3
"""DuckDB arm of the sf1 VALUE-EQUALITY gate (VERDICT r16 ask #3).

graft.tools.Sf1Correctness (Spark arm) dumps, for the ~30 most
data-bound queries (ranked by full-surface JobCensus shuffle bytes at
sf0.1), each result to <sf1Dir>/sc_results/<name>/ plus the gate's
oracle SQL VERBATIM (sc_oracle.json) and row counts (sc_rows.json).
This script replays every oracle in DuckDB over the SAME 10x parquet
and compares FULL VALUES (sorted columns, sorted rows, str-compare —
the dev_check idiom), then writes CORRECTNESS_SF1.json.

Carve-outs (a query whose DUCKDB oracle is infeasible at this scale,
e.g. a quadratic spill blowup) are declared in CARVE_OUTS with the
reason; they are recorded as "carved_out" in the artifact, never
silently skipped.

Usage: python3 scripts/sf1_correctness.py <sf1Dir> [outJson] \
           [only,csv] [carve:name=reason;...]
The optional csv restricts the replay to a subset (the 100x gate runs
the top-15 shuffle-ranked only); the optional carve list adds
per-invocation carve-outs (evidence in the reason string).
Driver-side tooling only (duckdb/pandas are not library deps).
"""
import glob
import json
import os
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# name -> reason; empty today — populate ONLY with evidence (e.g. the
# v14-style DuckDB quadratic spill documented in SF1.json)
CARVE_OUTS = {}


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf1_dir, out_json="CORRECTNESS_SF1.json", only=None, carve_outs=None):
    oracle = json.load(open(os.path.join(sf1_dir + "-harness", "sc_oracle.json")))
    spark_rows = json.load(open(os.path.join(sf1_dir + "-harness", "sc_rows.json")))
    if only is not None:
        unknown = set(only) - set(oracle)
        assert not unknown, f"unknown queries in --only: {sorted(unknown)}"
        oracle = {k: v for k, v in oracle.items() if k in set(only)}
    # CLI carve-outs must name real gate queries (a typo must fail loudly,
    # not silently green the gate) and are recorded under a DISTINCT key
    # (cli_carve) so auditors can tell invocation-time carves from the
    # code-reviewed committed CARVE_OUTS (ADVICE r18)
    cli_carves = dict(carve_outs or {})
    unknown_carves = set(cli_carves) - set(oracle)
    assert not unknown_carves, \
        f"carve-out names not in the replayed oracle set: {sorted(unknown_carves)}"
    carve_outs = dict(CARVE_OUTS, **cli_carves)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf1_dir, f"{t}.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    results, n_pass = {}, 0
    for name, sql in oracle.items():
        if name in carve_outs:
            key = "cli_carve" if name in cli_carves else "carved_out"
            results[name] = {key: carve_outs[name]}
            continue
        t0 = time.time()
        want = norm(con.execute(sql).df())
        dd_sec = round(time.time() - t0, 2)
        files = sorted(glob.glob(os.path.join(sf1_dir + "-harness", "sc_results", name, "*.parquet")))
        if not files:
            results[name] = {"error": "missing spark value dump"}
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        cols_ok = list(got.columns) == list(want.columns)
        rows_ok = len(got) == len(want) == spark_rows.get(name, -1)
        values_ok = (cols_ok and len(got) == len(want)
                     and got.astype(str).values.tolist()
                         == want.astype(str).values.tolist())
        ok = cols_ok and rows_ok and values_ok
        n_pass += ok
        results[name] = {"rows": len(want), "duckdb_sec": dd_sec,
                         "cols_match": cols_ok, "rows_match": rows_ok,
                         "values_match": values_ok, "pass": bool(ok)}
        print(f"{'PASS' if ok else 'FAIL'} {name} ({len(want)} rows, duckdb {dd_sec}s)")
    # the contract names the exact corpus (dir + generator stamp from the
    # Spark arm's _DONE file) so the committed artifact is reproducible
    # from this committed script alone (ADVICE r18)
    try:
        gen_stamp = open(os.path.join(sf1_dir, "_DONE")).read().strip()
    except OSError:
        gen_stamp = "unknown (no _DONE stamp)"
    scale = (f"the selected subset (shuffle-byte-ranked) over the "
             f"disjoint-copy corpus at {sf1_dir} (generator stamp: {gen_stamp})"
             if only is not None else
             f"the disjoint-copy corpus at {sf1_dir} "
             f"(generator stamp: {gen_stamp})")
    artifact = {
        "contract": (f"data-bound queries (full-surface JobCensus shuffle-byte "
                     f"ranking at sf0.1) value-equal vs DuckDB on {scale}; oracle "
                     f"SQL verbatim from the committed gate, no cap rescaling; "
                     f"carve-outs only with measured evidence"),
        "generator_stamp": gen_stamp,
        "only": sorted(only) if only is not None else None,
        "sf1_dir": sf1_dir,
        "n_queries": len(oracle),
        "n_pass": n_pass,
        "n_carved_out": len([r for r in results.values()
                             if "carved_out" in r or "cli_carve" in r]),
        "all_pass": n_pass + len([r for r in results.values()
                                  if "carved_out" in r or "cli_carve" in r])
                    == len(oracle),
        "queries": results,
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"== {n_pass} pass / {len(oracle) - n_pass} other == -> {out_json}")
    return 0 if artifact["all_pass"] else 1


if __name__ == "__main__":
    # usage: sf1_correctness.py <sf1Dir> [outJson] [only,csv] [carve:name=reason;...]
    only = sys.argv[3].split(",") if len(sys.argv) > 3 and sys.argv[3] else None
    carve = None
    if len(sys.argv) > 4 and sys.argv[4]:
        carve = dict(kv.split("=", 1) for kv in sys.argv[4].split(";"))
    sys.exit(main(sys.argv[1],
                  sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_SF1.json",
                  only, carve))
