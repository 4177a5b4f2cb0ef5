#!/bin/bash
# Re-run the x1 half of the r11 A/B (the first attempt's DuckDB passes
# died on the Spark-parquet-directory layout before ab_oracle.py learned
# to glob) and merge the rows into SCALING_R11_AB.json.
set -u
cd /root/repo
X1=/tmp/graft_r11/x1
VOUT=/tmp/graft_r11/vout
TMP=$(mktemp)
log() { echo "[r11_ab_x1 $(date +%H:%M:%S)] $*"; }
for q in q_pagerank q_bigram_logprob q_triangle_count; do
  for pass in 1 2; do
    log "A/B $q x1 pass $pass"
    sbt -batch "runMain graft.WeakRecert $q $X1" 2>&1 |
      grep -o '{"metric":"weak_recert".*' >> "$TMP"
    python3 scripts/ab_oracle.py "$q" "$X1" "$VOUT" >> "$TMP"
  done
done
python3 - "$TMP" <<'EOF'
import json, sys
prev = json.load(open("SCALING_R11_AB.json"))
rows = prev["rows"] + [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
json.dump({"metric": "r11_x10_ab", "protocol": prev.get("protocol"),
           "note": "x1 oracle passes re-run after ab_oracle.py learned "
                   "the parquet-directory layout; x1 Spark rows appear "
                   "in both attempts (more passes, same protocol)",
           "rows": rows}, open("SCALING_R11_AB.json", "w"), indent=1)
EOF
log "done"
