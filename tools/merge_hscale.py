#!/usr/bin/env python3
"""Merge per-phase /tmp/hscale_<algo>.md tables into H_SCALE.md.

Phases not present in /tmp keep their row from the committed H_SCALE.md
(so a resumed rehearsal never loses earlier evidence). Run by
tools/run_hscale.sh after each phase and at the end; safe to run by hand.

Section handling (ADVICE r11): the committed file's top-level `## `
sections are preserved in order and exactly once — the previous version
captured "first `## Round-` header to end of file" as one narrative blob,
which duplicated any trailing non-Round section on every merge and lost a
committed `## Notes` section that preceded the round narratives. Now:
  - the header + table + explanation paragraph are regenerated;
  - a committed `## Notes` section is kept and new phase notes are
    appended to it (deduplicated by exact line);
  - every other committed `## ` section (Round narratives, hand-added
    sections) is passed through verbatim, once.
"""
import re, os, sys

algos = ["riskloc", "autoroot", "robustspot", "squeeze", "adtributor", "revrec", "hotspot"]
header, rows, new_notes = None, [], []
prev_rows, prev_sections = {}, []
if os.path.exists("H_SCALE.md"):
    prev = open("H_SCALE.md").read()
    for line in prev.splitlines():
        if line.startswith("|") and not line.startswith("| algorithm") and not line.startswith("|---"):
            name = line.split("|")[1].strip()
            if name in algos:  # skip table rows of narrative-section tables
                prev_rows[name] = line
    header = prev[:prev.index("| algorithm")] if "| algorithm" in prev else None
    # split the committed file into top-level sections; parts[0] is the
    # regenerated header/table/explanation, the rest pass through
    parts = re.split(r"(?m)^(?=## )", prev)
    prev_sections = [p.rstrip() + "\n" for p in parts[1:]]
for a in algos:
    p = f"/tmp/hscale_{a}.md"
    if not os.path.exists(p):
        if a in prev_rows:
            rows.append(prev_rows[a])
        else:
            new_notes.append(f"- {a}: phase not yet run (see /tmp/hscale_{a}.log)")
        continue
    text = open(p).read()
    if header is None and "| algorithm" in text:
        header = text[:text.index("| algorithm")]
    for line in text.splitlines():
        if line.startswith("|") and not line.startswith("| algorithm") and not line.startswith("|---"):
            rows.append(line)
    nm = re.search(r"## Notes\n\n(.*)", text, re.S)
    if nm:
        new_notes.extend(l for l in nm.group(1).strip().splitlines() if l)
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
emitted_notes = False
for sec in prev_sections:
    if sec.startswith("## Notes"):
        body = [l for l in sec.splitlines()[1:] if l.strip()]
        merged = body + [n for n in new_notes if n not in body]
        out += "\n## Notes\n\n" + "\n".join(merged) + "\n"
        emitted_notes = True
    else:
        out += "\n" + sec
if new_notes and not emitted_notes:
    out += "\n## Notes\n\n" + "\n".join(new_notes) + "\n"
open("H_SCALE.md", "w").write(out)
print("wrote H_SCALE.md with", len(rows), "phase rows")
