#!/usr/bin/env python3
"""Repo-owned leak scan (ADVICE r6: make a re-run machine-distinguishable
from a round-number edit). Scans every tracked source/doc file for
non-public references — imports outside the public dependency set,
URLs off a public allowlist, cloud-bucket schemes, chat/short links, and
credential-shaped strings — and writes LEAKCHECK_SELF.json with, beyond
the hit lists, the scanned-file count, total bytes, and a sha256 over
the scanned content, so two runs over different trees can never produce
byte-identical output.

Run: python3 tools/leakcheck.py   (from the repo root; exit 1 on hits)
"""
import hashlib
import json
import re
import subprocess
import sys

PUBLIC_URL = re.compile(
    r"https?://(?:[a-z0-9.-]*\.)?"
    r"(?:apache\.org|github\.com|githubusercontent\.com|arxiv\.org|"
    r"python\.org|numpy\.org|scipy\.org|pydata\.org|scala-lang\.org|"
    r"scalatest\.org|wikipedia\.org|acm\.org|ieee\.org|openreview\.net|"
    r"vldb\.org|mit\.edu|cmu\.edu|scala-sbt\.org|oracle\.com|openjdk\.org|"
    r"w3\.org|unicode\.org|ietf\.org|localhost)(?:[/:#?]|$)")
URL = re.compile(r"https?://[^\s\"'`<>)\]]+")
PUBLIC_IMPORT = re.compile(
    r"^\s*import\s+(?:org\.apache\.|org\.scalatest|org\.scalacheck|"
    r"org\.slf4j|org\.junit|org\.xerial|com\.fasterxml\.jackson)")
# only rooted package imports can name a non-public dependency; Scala
# value-member imports (`import spark.implicits._`) and Python stdlib/
# public-lib imports are fine
IMPORT = re.compile(r"^\s*import\s+(?:com|net|io|ai|dev|org|software|cloud)\.")
CHECKS = {
    "bucket-uri": re.compile(r"\b(?:s3|s3a|gs|abfss?|wasbs?)://[^\s\"'`]+"),
    "chat-or-shortlink": re.compile(
        r"\b[a-z0-9-]+\.slack\.com|slack" r"://|\bgo/[a-z][a-z0-9-]{2,}\b"),
    "api-key": re.compile(
        r"\b(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{36}|"
        r"xox[baprs]-[A-Za-z0-9-]{10,}|AIza[0-9A-Za-z_-]{35})\b"),
    "private-ssh-key": re.compile(r"-----BEGIN [A-Z ]*PRIVATE KEY-----"),
}
SCAN_EXT = (".scala", ".py", ".sh", ".md", ".sbt", ".json", ".yml", ".yaml")


def main():
    files = sorted(
        f for f in subprocess.run(
            ["git", "ls-files"], capture_output=True, text=True, check=True
        ).stdout.splitlines()
        if f.endswith(SCAN_EXT) and not f.startswith("src/test/resources/")
        and f not in ("LEAKCHECK_SELF.json", "LEAKCHECK.json"))  # scanner output quotes hits
    hits = {k: [] for k in
            ("internal-import", "internal-url", *CHECKS)}
    digest = hashlib.sha256()
    total_bytes = 0
    for f in files:
        data = open(f, "rb").read()
        digest.update(f.encode() + b"\0" + data)
        total_bytes += len(data)
        text = data.decode("utf-8", "replace")
        for ln, line in enumerate(text.splitlines(), 1):
            if IMPORT.match(line) and not PUBLIC_IMPORT.match(line):
                hits["internal-import"].append(f"{f}:{ln}: {line.strip()[:120]}")
            for m in URL.finditer(line):
                if not PUBLIC_URL.match(m.group(0)):
                    hits["internal-url"].append(f"{f}:{ln}: {m.group(0)[:120]}")
            for name, rx in CHECKS.items():
                for m in rx.finditer(line):
                    hits[name].append(f"{f}:{ln}: {m.group(0)[:120]}")
    out = {
        "n_hits": sum(len(v) for v in hits.values()),
        "scanned_files": len(files),
        "scanned_bytes": total_bytes,
        "content_sha256": digest.hexdigest(),
        "hits": hits,
    }
    with open("LEAKCHECK_SELF.json", "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(f"scanned {len(files)} files ({total_bytes} bytes), "
          f"{out['n_hits']} hits -> LEAKCHECK_SELF.json")
    sys.exit(1 if out["n_hits"] else 0)


if __name__ == "__main__":
    main()
