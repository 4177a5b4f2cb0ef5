#!/bin/bash
# Post-plan-change A/B for the two rows the r11 x10 A/B left >2×:
# re-measure at x10 with the new plans (triangle: shared-subtree
# checkpoints, 42→7 exchanges; bigram: windowless bigram zip + single
# model join), then add the x100 decade point on BOTH engines — the
# ratio trend as work grows is the floor-amortization evidence.
set -u
cd /root/repo
X10=/tmp/graft_r11/x10
X100=/tmp/graft_r11/x100
VOUT=/tmp/graft_r11/vout
TMP=$(mktemp)
log() { echo "[r11_ab2 $(date +%H:%M:%S)] $*"; }
ab() { # query dir
  sbt -batch "runMain graft.WeakRecert $1 $2" 2>&1 |
    grep -o '{"metric":"weak_recert".*' >> "$TMP"
  python3 scripts/ab_oracle.py "$1" "$2" "$VOUT" >> "$TMP"
}
for q in q_bigram_logprob q_triangle_count; do
  log "A/B $q x10 pass 1 (new plans)"; ab "$q" "$X10"
  log "A/B $q x10 pass 2 (new plans)"; ab "$q" "$X10"
done
log "x100 fixture"
sbt -batch "runMain graft.ScaleFixture $X100 100" 2>&1 | tail -1
for q in q_bigram_logprob q_triangle_count; do
  log "A/B $q x100 pass 1"; ab "$q" "$X100"
  log "A/B $q x100 pass 2"; ab "$q" "$X100"
done
python3 - "$TMP" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
json.dump({"metric": "r11_ab_postfix",
           "note": "x10 re-measure AFTER the plan changes (triangle "
                   "shared-subtree checkpoints, bigram zip + single "
                   "model join) plus the x100 decade point, both engines",
           "protocol": "S/D interleave, warmupx2+min5 per pass",
           "rows": rows}, open("SCALING_R11_AB2.json", "w"), indent=1)
EOF
log "done"
