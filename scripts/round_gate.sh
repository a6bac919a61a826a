#!/usr/bin/env bash
# Round release gate: refresh every committed evidence artifact and fail
# loudly if any gate is red. Run before ending a round.
#
#   scripts/round_gate.sh <round_number> [sfDir]
#
# Produces/refreshes: TEST_SUMMARY.json (sbt test, release-blocking),
# LEAKCHECK.json (provenance-stamped scan, release-blocking),
# bench_detail.json (full Spark bench), DUCKDB_BENCH.json (oracle
# baselines; skipped unless REFRESH_DUCKDB=1 since it is slow and only
# changes when oracles do).
set -u
ROUND="${1:?round number required}"
SFDIR="${2:-/root/testdata/sf0.1}"
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
cd "$ROOT"
fail=0

# host-health stamp (VERDICT r18 ask #1): single-thread AND 32-thread
# probes — only the multi-thread number predicts bench throughput on
# this host. Informational (never gates), but always on the record.
echo "== host probe =="
python3 scripts/host_probe.py || true

echo "== leakcheck =="
python3 scripts/leakcheck.py "$ROUND" || fail=1

echo "== full test suite =="
python3 scripts/test_summary.py "$ROUND" || fail=1

# the census prices COLD builds and the bench-honesty rule forbids a
# persistent root for any headline: both steps run with the root UNSET
# regardless of the caller's environment (ADVICE r16; ArtifactCensus
# additionally refuses a persistent root itself, belt and braces)
echo "== materialized artifact census ($SFDIR) =="
env -u SPARK_GRAFT_SCRATCH_ROOT SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" sbt -batch \
  "runMain graft.tools.ArtifactCensus $SFDIR ARTIFACTS.json" >/dev/null 2>&1 \
  && python3 -c "import json;d=json.load(open('ARTIFACTS.json'));print(f\"{d['n_artifacts']} artifacts, cold build {d['total_build_sec']}s\")" \
  || fail=1

echo "== spark bench ($SFDIR) =="
env -u SPARK_GRAFT_SCRATCH_ROOT \
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' || fail=1

if [ "${REFRESH_DUCKDB:-0}" = "1" ]; then
  echo "== duckdb baselines =="
  rm -rf /tmp/round_gate_verify
  SPARK_GRAFT_CPUS=8 sbt -batch \
    "runMain graft.Verify $SFDIR /tmp/round_gate_verify" >/dev/null 2>&1
  python3 scripts/duckdb_bench.py "$SFDIR" \
    /tmp/round_gate_verify/oracle_sql.json 3 || fail=1
fi

echo "== bench-vs-oracle table =="
python3 scripts/bench_table.py || fail=1

if [ "$fail" -ne 0 ]; then
  echo "ROUND GATE: RED — do not ship" >&2
  exit 1
fi
echo "ROUND GATE: green"
