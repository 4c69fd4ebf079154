#!/usr/bin/env python3
"""Regenerate LEAKCHECK.json over the repo's source (ADVICE r05 #2).

Scans every tracked source/doc file for the seven leak categories and
writes LEAKCHECK.json WITH a scan timestamp and scanned-file/LoC counts,
so each round's entry evidences an actual re-run rather than a hand-bump.

Usage: python3 tools/leakcheck.py <round_number>
"""
import json
import os
import re
import subprocess
import sys
import time

PATTERNS = {
    # imports outside the public dependency surface (spark/scala/java/graft
    # + the test-time scalatest/scalacheck stack)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.|scala\b|scala\.|java\.|javax\.|graft\.|"
        r"org\.scalatest|org\.scalacheck|org\.junit|com\.fasterxml|org\.slf4j|"
        # Scala val-imports of a local SparkSession (spark.implicits._ etc.)
        r"\w+\.implicits\._)"
        r"[a-zA-Z_][\w.]*"),
    # URLs pointing anywhere but the public Spark/Apache/GitHub doc surface
    "internal-url": re.compile(
        r"https?://(?!(?:spark|parquet|avro|orc|kafka|hadoop)\.apache\.org|"
        r"(?:www\.)?apache\.org|github\.com|(?:www\.)?scala-lang\.org|"
        r"duckdb\.org|(?:www\.)?scalatest\.org|docs\.oracle\.com|"
        r"en\.wikipedia\.org|arxiv\.org|dl\.acm\.org|localhost|127\.0\.0\.1)"
        r"[\w.-]+"),
    # non-public package/vendor names (any hit is a leak by definition here)
    "internal-pkg2": re.compile(
        r"\b(?:anthropic|claude[-_ ]?code|bedrock[-_ ]?internal)\b", re.I),
    # object-store buckets (no bucket of any kind belongs in this repo)
    "internal-bucket": re.compile(r"\b(?:s3|s3a|gs|abfss?)://[\w.-]+"),
    "slack-link": re.compile(r"\b(?:[\w-]+\.slack\.com|hooks\.slack|slack://)"),
    "api-key": re.compile(
        r"\b(?:sk-[A-Za-z0-9]{16,}|AKIA[0-9A-Z]{16}|xox[abpsr]-[\w-]{10,}|"
        r"ghp_[A-Za-z0-9]{30,}|AIza[\w-]{30,})"),
    # environment variables beyond the repo's own SPARK_GRAFT_* knobs and
    # the standard spark/hadoop/java ones
    "axon-env": re.compile(r"\b(?:AXON|ANTHROPIC|CLAUDE)_[A-Z0-9_]+"),
}

EXTS = {".scala", ".sbt", ".py", ".md", ".json", ".jsonl", ".sql", ".txt"}


def tracked_files(root):
    out = subprocess.run(["git", "ls-files"], cwd=root, capture_output=True,
                         text=True, check=True).stdout.splitlines()
    return [f for f in out if os.path.splitext(f)[1] in EXTS
            and not f.startswith("LEAKCHECK")
            # the scanner's own pattern definitions match themselves
            and f != "tools/leakcheck.py"]


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hits = {k: [] for k in PATTERNS}
    n_files = 0
    n_lines = 0
    for rel in tracked_files(root):
        path = os.path.join(root, rel)
        try:
            with open(path, encoding="utf-8", errors="replace") as fh:
                lines = fh.readlines()
        except OSError:
            continue
        n_files += 1
        n_lines += len(lines)
        ext = os.path.splitext(rel)[1]
        for i, line in enumerate(lines, 1):
            for cat, pat in PATTERNS.items():
                # the JVM-import rule only means anything in scala sources —
                # tools/*.py deliberately use the driver-side python stack
                # (duckdb/pandas), which the brief sanctions for dev tools
                if cat == "internal-import" and ext not in (".scala", ".sbt"):
                    continue
                if pat.search(line):
                    hits[cat].append(f"{rel}:{i}: {line.strip()[:160]}")
    result = {
        "round": rnd,
        "scanned_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "scanned_files": n_files,
        "scanned_lines": n_lines,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(os.path.join(root, "LEAKCHECK.json"), "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(json.dumps({k: len(v) for k, v in hits.items()}),
          f"files={n_files} lines={n_lines}")
    return 1 if result["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
