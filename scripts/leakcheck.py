#!/usr/bin/env python3
"""Provenance-stamped leak scan over the committed tree.

Scans every tracked text file for categories of strings that must never
appear in this repo (internal package imports, non-public URLs/buckets,
credential-shaped tokens, chat permalinks, environment names that are not
part of the public Spark/Hadoop surface) and writes LEAKCHECK.json with a
scan timestamp and the scanned commit hash, so each round's scan is
provably fresh (previous rounds bumped the round number by hand, which is
indistinguishable from not scanning at all).

Usage: python3 scripts/leakcheck.py [round_number]
Exit code is nonzero when any category has hits.
"""
import json, os, re, subprocess, sys, time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Allowlists for the public surfaces the code legitimately references.
PUBLIC_URL = re.compile(
    r"https?://(?:www\.)?("
    r"github\.com|raw\.githubusercontent\.com|spark\.apache\.org|"
    r"issues\.apache\.org|hadoop\.apache\.org|arxiv\.org|doi\.org|"
    r"ngff\.openmicroscopy\.org|zarr\.readthedocs\.io|"
    r"numcodecs\.readthedocs\.io|facebook\.github\.io|"
    r"en\.wikipedia\.org|datatracker\.ietf\.org|www\.itu\.int|"
    r"zeiss\.github\.io|docs\.aws\.amazon\.com|duckdb\.org|"
    r"maven\.apache\.org|repo1\.maven\.org|www\.scala-sbt\.org|"
    r"opensource\.org|www\.apache\.org|localhost|127\.0\.0\.1|example\.com"
    r")(?=[/\s\"')\]>.,;:]|$)")

CATEGORIES = {
    # imports of reverse-domain packages outside the public namespaces
    # this project may use (local value imports like `spark.implicits._`
    # and Python stdlib imports are not reverse-domain and don't match)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.|java\.|javax\.|scala\.|graft\.|"
        r"org\.scalatest|org\.scalacheck|org\.slf4j|org\.junit|"
        r"com\.fasterxml|org\.xerial|com\.github\.luben|org\.lz4|"
        # the JDK's own bundled HTTP server (public module jdk.httpserver,
        # used by S3RetrySpec's fault-injecting reverse proxy) — part of
        # every JDK distribution, not a third-party/internal namespace
        r"com\.sun\.net\.httpserver)"
        r"(?:com|org|net|io|ai|dev|cloud|corp|internal)\.\S+",
        re.M),
    # any URL not on the public allowlist
    "internal-url": re.compile(r"https?://\S+"),
    # object-store buckets: any s3/gs URI is suspect (the library takes
    # bucket paths as user arguments, never hardcodes one)
    "internal-bucket": re.compile(r"(?:s3a?|gs|abfss?)://[a-z0-9][a-z0-9.-]+"),
    # chat permalinks / internal shortlinks
    "slack-link": re.compile(r"slack\.com/archives|(?<![\w/])go/[a-z][\w-]{2,}"),
    # credential-shaped tokens
    "api-key": re.compile(
        r"(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{20,}|"
        r"xox[bap]-[A-Za-z0-9-]{10,}|-----BEGIN (?:RSA |EC )?PRIVATE KEY)"),
    # env vars outside the public SPARK_/HADOOP_/JAVA_/COURSIER_ surface
    # and this project's own SPARK_GRAFT_ namespace
    "nonpublic-env": re.compile(
        r"(?:sys\.env|os\.environ|getenv)[\s(\[.]*[\"']"
        r"(?!SPARK_|HADOOP_|JAVA_|PATH|HOME|TMPDIR|USER|COURSIER_|SBT_|TZ)"
        r"([A-Z][A-Z0-9_]{3,})[\"']"),
}

TEXT_EXT = {".scala", ".py", ".sbt", ".md", ".json", ".sh", ".properties",
            ".txt", ".yml", ".yaml", ".conf", ".sql"}


def tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=ROOT,
                         capture_output=True, text=True).stdout
    return [f for f in out.splitlines()
            if os.path.splitext(f)[1] in TEXT_EXT and os.path.exists(
                os.path.join(ROOT, f))]


def main(round_no=None):
    hits = {k: [] for k in CATEGORIES}
    for rel in tracked_files():
        try:
            text = open(os.path.join(ROOT, rel), encoding="utf-8",
                        errors="replace").read()
        except OSError:
            continue
        for cat, rx in CATEGORIES.items():
            for m in rx.finditer(text):
                s = m.group(0)
                if cat == "internal-url" and PUBLIC_URL.match(s):
                    continue
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{rel}:{line}: {s[:120]}")
    commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                            capture_output=True, text=True).stdout.strip()
    n = sum(len(v) for v in hits.values())
    out = {
        "round": round_no,
        "commit": commit,
        "timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "files_scanned": len(tracked_files()),
        "n_hits": n,
        "hits": hits,
    }
    with open(os.path.join(ROOT, "LEAKCHECK.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: out[k] for k in
                      ("round", "commit", "files_scanned", "n_hits")}))
    for cat, v in hits.items():
        for h in v[:20]:
            print(f"  {cat}: {h}", file=sys.stderr)
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else None))
