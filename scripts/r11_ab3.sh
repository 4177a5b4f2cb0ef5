#!/bin/bash
# Round-11 extension study:
#   1. q_paragraph_dedup gets the same two-sided decade A/B the trio got
#      (x1/x10/x100, S/D interleaved, warmupx2 + min-of-5 per pass).
#   2. The x1000 crossing point for q_triangle_count / q_bigram_logprob —
#      the two rows whose ratio was still falling at x100 — under a
#      lighter one-warmup + min-of-2 protocol (a single run is minutes).
set -u
cd /root/repo
X1=/tmp/graft_r11/x1
X10=/tmp/graft_r11/x10
X100=/tmp/graft_r11/x100
X1000=/tmp/graft_r11/x1000
VOUT=/tmp/graft_r11/vout
TMP=$(mktemp)
log() { echo "[r11_ab3 $(date +%H:%M:%S)] $*"; }

for dir in $X1 $X10 $X100; do
  for pass in 1 2; do
    log "para A/B $dir pass $pass"
    sbt -batch "runMain graft.WeakRecert q_paragraph_dedup $dir" 2>&1 |
      grep -o '{"metric":"weak_recert".*' >> "$TMP"
    python3 scripts/ab_oracle.py q_paragraph_dedup "$dir" "$VOUT" >> "$TMP"
  done
done

log "x1000 fixture"
sbt -batch "runMain graft.ScaleFixture $X1000 1000" 2>&1 | tail -1
for q in q_bigram_logprob q_triangle_count; do
  for pass in 1 2; do
    log "$q x1000 pass $pass"
    SPARK_GRAFT_RECERT_WARMUPS=1 SPARK_GRAFT_RECERT_RUNS=2 \
      sbt -batch "runMain graft.WeakRecert $q $X1000" 2>&1 |
      grep -o '{"metric":"weak_recert".*' >> "$TMP"
    python3 scripts/ab_oracle.py "$q" "$X1000" "$VOUT" 2 >> "$TMP"
  done
done
python3 - "$TMP" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
json.dump({"metric": "r11_ab_ext",
           "protocol": "paragraph: S/D warmupx2+min5; x1000: S/D warmupx1+min2",
           "rows": rows}, open("SCALING_R11_AB3.json", "w"), indent=1)
EOF
log "done"
