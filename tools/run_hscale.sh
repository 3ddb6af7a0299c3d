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
# PHASES env var lets a resumed run skip phases already recorded in the
# committed H_SCALE.md (their rows are preserved by the merge below).
for algo in ${PHASES:-riskloc autoroot robustspot squeeze adtributor revrec hotspot}; do
  echo "=== phase $algo ==="
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" tools/run_main.sh -Xmx48g \
    graft.runner.HScale "$N" "$DIMS" "/tmp/hscale_${algo}.md" "$SAMPLES" \
    "$algo" "$CORPUS" > "/tmp/hscale_${algo}.log" 2>&1
  rc=$?
  tail -3 "/tmp/hscale_${algo}.log"
  if [ $rc -ne 0 ]; then echo "PHASE $algo FAILED (rc=$rc)"; FAILED=1; fi
  python3 tools/merge_hscale.py   # incremental: evidence lands per phase
done

python3 tools/merge_hscale.py
exit $FAILED
