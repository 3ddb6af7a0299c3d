#!/usr/bin/env python3
"""Merge per-phase /tmp/hscale_<algo>.md tables into H_SCALE.md.

Phases not present in /tmp keep their row from the committed H_SCALE.md
(so a resumed rehearsal never loses earlier evidence). Run by
tools/run_hscale.sh after each phase and at the end; safe to run by hand.
"""
import re, os, sys

algos = ["riskloc", "autoroot", "robustspot", "squeeze", "adtributor", "revrec", "hotspot"]
header, rows, notes = None, [], []
prev_rows, narrative = {}, ""
if os.path.exists("H_SCALE.md"):
    prev = open("H_SCALE.md").read()
    for line in prev.splitlines():
        if line.startswith("|") and not line.startswith("| algorithm") and not line.startswith("|---"):
            name = line.split("|")[1].strip()
            if name in algos:  # skip table rows of narrative-section tables
                prev_rows[name] = line
    header = prev[:prev.index("| algorithm")] if "| algorithm" in prev else None
    # preserve committed "## Round-..." narrative sections across merges
    # (they are evidence, not per-phase output; the r11 merge lost r9's)
    m = re.search(r"^## Round-.*", prev, re.S | re.M)
    if m:
        narrative = m.group(0).rstrip() + "\n"
for a in algos:
    p = f"/tmp/hscale_{a}.md"
    if not os.path.exists(p):
        if a in prev_rows:
            rows.append(prev_rows[a])
        else:
            notes.append(f"- {a}: phase not yet run (see /tmp/hscale_{a}.log)")
        continue
    text = open(p).read()
    if header is None and "| algorithm" in text:
        header = text[:text.index("| algorithm")]
    for line in text.splitlines():
        if line.startswith("|") and not line.startswith("| algorithm") and not line.startswith("|---"):
            rows.append(line)
    nm = re.search(r"## Notes\n\n(.*)", text, re.S)
    if nm:
        notes.extend(l for l in nm.group(1).strip().splitlines() if l)
out = header or "# H-shape scale rehearsal\n\n"
out += "| algorithm | batch wall (s) | seq-check wall (s) | Spark jobs (batch) | driver heap high-water (MB) | causes found | batch == sequential (sampled) |\n"
out += "|---|---|---|---|---|---|---|\n"
out += "\n".join(rows) + "\n"
out += ("\nEach phase ran in its own JVM (tools/run_hscale.sh) against the one "
        "shared parquet corpus. Job counts are per whole-corpus batch DAG "
        "(driver-coordinated passes over instance-keyed aggregations): they "
        "scale with layers/rounds/iterations, never with row or instance "
        "count. In local[32] the heap high-water includes executor-side "
        "Tungsten state for the 96M-row scans/shuffles, not just driver "
        "state; driver state proper is bounded to per-candidate summaries.\n")
if notes:
    out += "\n## Notes\n\n" + "\n".join(notes) + "\n"
if narrative:
    out += "\n" + narrative
open("H_SCALE.md", "w").write(out)
print("wrote H_SCALE.md with", len(rows), "phase rows")
