#!/usr/bin/env python3
"""Provenance-bearing leak check (round-5 review: LEAKCHECK.json carried
only hit lists and a round number, so a genuine re-scan was
indistinguishable from a round-number edit). This tool re-scans the repo
source for the same seven detector categories and writes LEAKCHECK.json
with `n_files_scanned` and `generated_utc` so every emission is provably a
fresh run. Usage:

    python3 tools/leakcheck.py [repo_root] [out.json]

Detectors are deliberately broad: anything that looks like a non-public
package import, a non-public URL/hostname, a cloud bucket, a Slack link,
an API-key-shaped literal, or an internal-looking environment variable.
The engine is built from public knowledge only (Spark API + the public
reference repo), so every category must stay empty.
"""
import json
import os
import re
import sys
import time

SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".sh", ".json", ".conf",
            ".properties", ".yaml", ".yml"}
SKIP_DIRS = {"target", ".git", ".bloop", ".metals", "project/target",
             "spark-warehouse", "metastore_db"}
# Public package roots the engine legitimately imports, plus the Python
# stdlib/driver-side modules the dev tools use.
PUBLIC_PKGS = ("org.apache", "scala", "java", "javax", "graft", "com.fasterxml",
               "org.scalatest", "org.scalacheck", "org.slf4j", "org.junit",
               "io.netty", "com.google", "org.codehaus", "org.xerial",
               "org.rocksdb", "org.json4s", "org.antlr",
               "json", "sys", "os", "re", "time", "math", "duckdb", "pyarrow",
               "hashlib", "subprocess")
# Public hosts that may appear in docs/comments.
PUBLIC_HOSTS = re.compile(
    r"(apache\.org|github\.com|githubusercontent\.com|scala-lang\.org|"
    r"scala-sbt\.org|duckdb\.org|iceberg\.apache\.org|arxiv\.org|"
    r"wikipedia\.org|example\.com|localhost|127\.0\.0\.1|json\.org|"
    r"w3\.org|ietf\.org|unicode\.org|openjdk\.org|oracle\.com|"
    r"min\.io|amazonaws\.com/?$|docs\.aws\.amazon\.com|maven\.org)")

DETECTORS = {
    "internal-import": re.compile(r"^\s*import\s+([a-z][\w.]+)", re.M),
    "internal-url": re.compile(r"https?://([\w.-]+)[\w./%-]*"),
    "internal-pkg2": re.compile(
        r"\b(?:com|net|io)\.(?:anthropic|internal|corp|proprietary)[\w.]*"),
    "internal-bucket": re.compile(
        r"s3a?://([\w.-]+)|gs://([\w.-]+)|wasbs?://([\w.-]+)"),
    "slack-link": re.compile(r"slack\.com/archives|app\.slack\.com|#[a-z-]*claude[a-z-]*"),
    "api-key": re.compile(
        r"\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9_-]{20,}|ghp_[A-Za-z0-9]{36}|"
        r"xox[bap]-[A-Za-z0-9-]{10,})\b"),
    "axon-env": re.compile(r"\b[A-Z]+_(?:INTERNAL|CORP|SECRET)[A-Z_]*\b"),
}
# Buckets/hosts used only in tests/docs as obvious placeholders (incl. the
# reference repo's public example bucket names quoted in docs).
ALLOWED_BUCKETS = re.compile(r"^(bucket|my-bucket|test-bucket|data|lake|"
                             r"warehouse|landing|input-data|output-data|"
                             r"\.\.\.|graft[\w-]*|example[\w-]*)$")


def scan_file(path, text, hits):
    for m in DETECTORS["internal-import"].finditer(text):
        pkg = m.group(1)
        # `import spark.implicits._`-style imports of a local session value
        # are Scala idiom, not package references.
        if ".implicits" in pkg:
            continue
        if not pkg.startswith(PUBLIC_PKGS):
            hits["internal-import"].append(f"{path}: {pkg}")
    for m in DETECTORS["internal-url"].finditer(text):
        if not PUBLIC_HOSTS.search(m.group(0)):
            hits["internal-url"].append(f"{path}: {m.group(0)[:80]}")
    for m in DETECTORS["internal-pkg2"].finditer(text):
        hits["internal-pkg2"].append(f"{path}: {m.group(0)[:80]}")
    for m in DETECTORS["internal-bucket"].finditer(text):
        bucket = next(g for g in m.groups() if g)
        if not ALLOWED_BUCKETS.match(bucket):
            hits["internal-bucket"].append(f"{path}: {m.group(0)[:80]}")
    for name in ("slack-link", "api-key", "axon-env"):
        for m in DETECTORS[name].finditer(text):
            # AWS's PUBLIC standard credential env vars (documented by AWS
            # and hadoop-aws) match the *_SECRET_* shape but are not
            # internal names — the S3 smoke spec must spell them exactly.
            if name == "axon-env" and m.group(0) in (
                    "AWS_SECRET_ACCESS_KEY", "AWS_ACCESS_KEY_ID"):
                continue
            hits[name].append(f"{path}: {m.group(0)[:80]}")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    out_path = sys.argv[2] if len(sys.argv) > 2 else "LEAKCHECK.json"
    rnd = None
    try:
        with open(os.path.join(root, "PROGRESS.jsonl")) as f:
            rnd = json.loads(f.readlines()[-1]).get("round")
    except Exception:
        pass
    hits = {k: [] for k in DETECTORS}
    n_files = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for fn in filenames:
            if os.path.splitext(fn)[1] not in SCAN_EXT:
                continue
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, root)
            if rel in ("LEAKCHECK.json",) or rel == "tools/leakcheck.py":
                continue  # self-matches on detector patterns
            try:
                text = open(p, encoding="utf-8", errors="replace").read()
            except OSError:
                continue
            n_files += 1
            scan_file(rel, text, hits)
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "n_files_scanned": n_files,
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "tool": "tools/leakcheck.py",
    }
    with open(os.path.join(root, out_path), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"scanned {n_files} files, {out['n_hits']} hits -> {out_path}")
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
