#!/usr/bin/env bash
# Per-phase-isolated sf1 ScaleEvidence run (VERDICT r5 "Next round" #6).
#
# The single-JVM phase sequence contaminates neighbors: r5 measured ann_lsh
# at 68 s when run right after exact_substr's 36 GB heap spike vs 18-24 s
# dedicated, and exact_dedup spreading 5.2-43.1 s from page-cache/GC
# effects. This driver runs every phase in its OWN fresh JVM (sbt fork),
# against the same cached corpus, and concatenates the per-phase JSON lines.
#
# Usage: tools/scale_evidence_isolated.sh [rows] [out.jsonl]
set -euo pipefail
cd "$(dirname "$0")/.."

ROWS="${1:-2000000}"
OUT="${2:-/tmp/scale_evidence_isolated_${ROWS}.jsonl}"
: > "$OUT"

PHASES=(full_pipeline exact_dedup minhash_dedup sentence_dedup url_dedup
        exact_substr exact_substr_anchored extract_general ann_lsh)

# warm the corpus cache once (gen_corpus always runs; phase filter "none"
# matches nothing else)
SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}" \
  sbt -batch "runMain graft.ScaleEvidence $ROWS none" >/dev/null 2>&1 || true

for p in "${PHASES[@]}"; do
  echo "=== phase $p (fresh JVM) ===" >&2
  SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}" \
    sbt -batch "runMain graft.ScaleEvidence $ROWS $p" 2>&1 |
    grep -o '{"phase":"'"$p"'".*}' | tail -1 >> "$OUT" || echo "phase $p FAILED" >&2
done

echo "wrote $OUT" >&2
cat "$OUT"
