#!/bin/bash
# Full-size H rehearsal driver (VERDICT r4 #4 / r5 #2 / r6 #3): generate the
# shared 4 x 24M-row corpus once, run each of the seven whole-corpus batch
# DAGs in its OWN JVM against it (fresh block manager per phase), then merge
# the per-phase tables into a single H_SCALE.md.
# Usage: tools/run_hscale.sh [corpusDir] [numInstances] [dims] [seqSamples]
set -uo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORPUS="${1:-/tmp/graft_h_corpus}"
N="${2:-4}"
DIMS="${3:-a10,b5,c250,d20,e8,f12}"
SAMPLES="${4:-1}"
cd "$REPO"

if [ ! -f "$CORPUS/_SUCCESS" ]; then
  echo "=== generating corpus $CORPUS ($N instances, dims $DIMS) ==="
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" tools/run_main.sh -Xmx48g \
    graft.runner.HCorpusGen "$CORPUS" "$N" "$DIMS" || exit 1
fi

FAILED=0
for algo in riskloc autoroot robustspot squeeze adtributor revrec hotspot; do
  echo "=== phase $algo ==="
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" tools/run_main.sh -Xmx48g \
    graft.runner.HScale "$N" "$DIMS" "/tmp/hscale_${algo}.md" "$SAMPLES" \
    "$algo" "$CORPUS" > "/tmp/hscale_${algo}.log" 2>&1
  rc=$?
  tail -3 "/tmp/hscale_${algo}.log"
  if [ $rc -ne 0 ]; then echo "PHASE $algo FAILED (rc=$rc)"; FAILED=1; fi
done

python3 - "$N" "$DIMS" "$SAMPLES" <<'EOF'
import sys, re, os
n, dims, samples = sys.argv[1], sys.argv[2], sys.argv[3]
algos = ["riskloc", "autoroot", "robustspot", "squeeze", "adtributor", "revrec", "hotspot"]
header, rows, notes = None, [], []
for a in algos:
    p = f"/tmp/hscale_{a}.md"
    if not os.path.exists(p):
        notes.append(f"- {a}: phase md missing (see /tmp/hscale_{a}.log)")
        continue
    text = open(p).read()
    m = re.search(r"^# .*?\n\n(.*?\n)\n\|", text, re.S)
    if header is None:
        header = text[:text.index("| algorithm")]
    for line in text.splitlines():
        if line.startswith("|") and not line.startswith("| algorithm") and not line.startswith("|---"):
            rows.append(line)
    nm = re.search(r"## Notes\n\n(.*)", text, re.S)
    if nm:
        notes.extend(l for l in nm.group(1).strip().splitlines() if l)
out = header
out += "| algorithm | batch wall (s) | seq-check wall (s) | Spark jobs (batch) | driver heap high-water (MB) | causes found | batch == sequential (sampled) |\n"
out += "|---|---|---|---|---|---|---|\n"
out += "\n".join(rows) + "\n"
out += ("\nEach phase ran in its own JVM (tools/run_hscale.sh) against the one "
        "shared parquet corpus. Job counts are per whole-corpus batch DAG "
        "(driver-coordinated passes over instance-keyed aggregations): they "
        "scale with layers/rounds/iterations, never with row or instance "
        "count. Driver heap holds per-candidate summaries only.\n")
if notes:
    out += "\n## Notes\n\n" + "\n".join(notes) + "\n"
open("H_SCALE.md", "w").write(out)
print("wrote H_SCALE.md with", len(rows), "phase rows")
EOF
exit $FAILED
