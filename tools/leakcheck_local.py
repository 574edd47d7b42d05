#!/usr/bin/env python3
"""Local leak scan replica (ADVICE r7 #1: verifiable freshness).

Scans every tracked source/doc file for internal-looking identifiers
(private package roots, non-public URLs, bucket URIs, chat links, API-key
shapes, internal env vars) and writes LEAKCHECK_LOCAL.json including a
UTC timestamp, the scanned commit, and the scanned-file count — so a
round bump in the artifact is backed by evidence the scan actually ran
against that round's code.

Usage: python3 tools/leakcheck_local.py [repo_root]
"""
import json
import re
import subprocess
import sys
import time

PATTERNS = {
    "internal-import": r"import\s+(?:com|net|org)\.anthropic|from\s+anthropic[._]internal",
    "internal-url": r"https?://[a-z0-9.-]*\.(?:corp|internal|intranet)\b|go/[a-z][a-z0-9-]+",
    "internal-pkg2": r"claude[-_]cli[-_]internal|anthropics/",
    "internal-bucket": r"s3://(?!public)[a-z0-9-]*(?:internal|private|anthropic)[a-z0-9-]*",
    "slack-link": r"slack\.com/archives|#claude-code-",
    "api-key": r"sk-ant-[A-Za-z0-9_-]{8,}|AKIA[0-9A-Z]{16}",
    "axon-env": r"\bANTHROPIC_[A-Z_]+\b",
}

SCAN_EXT = (".scala", ".py", ".md", ".sbt", ".properties", ".json", ".sh")


def main(root="."):
    files = subprocess.run(
        ["git", "-C", root, "ls-files"], capture_output=True, text=True, check=True
    ).stdout.split()
    commit = subprocess.run(
        ["git", "-C", root, "rev-parse", "HEAD"], capture_output=True, text=True, check=True
    ).stdout.strip()
    hits = {k: [] for k in PATTERNS}
    n_scanned = 0
    for f in files:
        if not f.endswith(SCAN_EXT) or f.startswith("tools/leakcheck_local"):
            continue
        try:
            text = open(f"{root}/{f}", encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        n_scanned += 1
        for key, pat in PATTERNS.items():
            for m in re.finditer(pat, text):
                line = text.count("\n", 0, m.start()) + 1
                hits[key].append(f"{f}:{line}:{m.group(0)[:60]}")
    out = {
        "scanned_at_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "scanned_commit": commit,
        "n_files_scanned": n_scanned,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(f"{root}/LEAKCHECK_LOCAL.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({k: len(v) for k, v in hits.items()}, indent=2))
    print(f"scanned {n_scanned} files at {commit[:10]} -> LEAKCHECK_LOCAL.json")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
