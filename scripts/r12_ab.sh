#!/bin/bash
# r12 two-sided decade A/B (r11 verdict items #2/#3): q_triangle_count on
# the NEW adjacency-intersect plan, and q_paragraph_dedup's first DuckDB
# denominator at x10/x100. S/D interleaved passes (WeakRecert warmup x2 +
# min-of-5 per engine per pass) on the same ScaleFixture decades.
set -u
cd /root/repo
X10=/tmp/graft_r12/x10
X100=/tmp/graft_r12/x100
VOUT=/tmp/graft_r12/vout
TMP=$(mktemp)
log() { echo "[r12_ab $(date +%H:%M:%S)] $*"; }
ab() { # query dir
  sbt -batch "runMain graft.WeakRecert $1 $2" 2>&1 |
    grep -o '{"metric":"weak_recert".*' >> "$TMP"
  python3 scripts/ab_oracle.py "$1" "$2" "$VOUT" >> "$TMP"
}
if [ ! -f "$VOUT/oracle_sql.json" ]; then
  log "oracle_sql.json dump"
  sbt -batch "runMain graft.Verify /root/testdata/sf0.001 $VOUT q_topk_orders" 2>&1 | tail -1
fi
for q in q_triangle_count q_paragraph_dedup; do
  for d in "$X10" "$X100"; do
    log "A/B $q $d pass 1"; ab "$q" "$d"
    log "A/B $q $d pass 2"; ab "$q" "$d"
  done
done
python3 - "$TMP" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
json.dump({"metric": "r12_ab",
           "note": "two-sided decade A/B: q_triangle_count on the r12 "
                   "adjacency-intersect plan (bivar vs the r11 wedge plan "
                   "in SCALING_R12_TRI.json), and q_paragraph_dedup's "
                   "first DuckDB denominator at x10/x100",
           "protocol": "S/D interleave, warmup x2 + min-of-5 per pass",
           "rows": rows}, open("SCALING_R12_AB.json", "w"), indent=1)
EOF
log "done"
