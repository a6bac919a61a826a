#!/usr/bin/env python3
"""Run the full ScalaTest suite and write TEST_SUMMARY.json — the
release gate artifact. Round 6 shipped with a red suite and nothing
noticed; this makes "sbt test is green" a committed, provenance-stamped
fact the judge (and the dev loop) can check without rerunning sbt.

Usage: python3 scripts/test_summary.py [round_number]

Writes TEST_SUMMARY.json:
  {"round":N,"commit":...,"timestamp_utc":...,"suites_completed":N,
   "suites_aborted":N,"tests_succeeded":N,"tests_failed":N,...,"green":bool}

Exit code is nonzero when any test fails or aborts — wire it into the
round script so a red suite blocks the round instead of shipping.
"""
import json, os, re, subprocess, sys, time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(round_no=None):
    t0 = time.time()
    proc = subprocess.run(["sbt", "-batch", "test"], cwd=ROOT,
                          capture_output=True, text=True)
    out = proc.stdout + proc.stderr
    # ScalaTest aggregate line:
    # [info] Tests: succeeded N, failed N, canceled N, ignored N, pending N
    # [info] Suites: completed N, aborted N
    tests = re.findall(r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), "
                       r"ignored (\d+), pending (\d+)", out)
    suites = re.findall(r"Suites: completed (\d+), aborted (\d+)", out)
    failed_suites = sorted(set(re.findall(r"^\[error\]\s+(\S+)$", out, re.M)))
    agg = [sum(int(m[i]) for m in tests) for i in range(5)]
    sagg = [sum(int(m[i]) for m in suites) for i in range(2)]
    commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                            capture_output=True, text=True).stdout.strip()
    green = (proc.returncode == 0 and tests and agg[1] == 0 and sagg[1] == 0)
    summary = {
        "round": round_no,
        "commit": commit,
        # VERDICT r12 ask #8: the stamp runs at the last CODE commit; any
        # later commit at round end is the evidence stamp itself, so HEAD
        # may sit one ahead of `commit` — that is the convention, not a
        # stale artifact.
        "commit_note": "stamped at last code commit; a later HEAD is the "
                       "round's evidence stamp",
        "timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "sbt_exit_code": proc.returncode,
        "wall_sec": round(time.time() - t0, 1),
        "suites_completed": sagg[0] if suites else None,
        "suites_aborted": sagg[1] if suites else None,
        "tests_succeeded": agg[0] if tests else None,
        "tests_failed": agg[1] if tests else None,
        "tests_canceled": agg[2] if tests else None,
        "tests_ignored": agg[3] if tests else None,
        "failed_suites": failed_suites,
        "green": bool(green),
    }
    with open(os.path.join(ROOT, "TEST_SUMMARY.json"), "w") as f:
        json.dump(summary, f, indent=1)
        f.write("\n")
    print(json.dumps(summary, indent=1))
    return 0 if green else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else None))
