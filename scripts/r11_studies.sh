#!/bin/bash
# Round-11 measurement session (run SERIALLY — every row is a timing):
#   1. kernel throughput re-measure (single-pass linkDensityPermyriad)
#   2. two-sided x10 Spark-vs-DuckDB A/B for the bench weak trio
#      (q_pagerank, q_bigram_logprob, q_triangle_count) — the r10 verdict
#      asked for a measurement at a scale where work dominates floor
#   3. quiet-box recerts for the four load-suspect driver readings
#      (q_paragraph_dedup, q_anomaly_zscore, q_ann_recall, q_bpe_encode)
# Interleave discipline: per (query, scale) the Spark and DuckDB halves
# run S/D/S/D so box-load drift cancels at the pass level (the r9/r10
# WeakRecert protocol).
set -u
cd /root/repo
X1=/tmp/graft_r11/x1
X10=/tmp/graft_r11/x10
VOUT=/tmp/graft_r11/vout

log() { echo "[r11_studies $(date +%H:%M:%S)] $*"; }

log "kernel study"
sbt -batch "runMain graft.KernelStudy 256" 2>&1 |
  grep -o '{"metric".*' > SCALING_R11_KERNELS.json

log "fixtures"
sbt -batch "runMain graft.ScaleFixture $X1 1" 2>&1 | tail -1
sbt -batch "runMain graft.ScaleFixture $X10 10" 2>&1 | tail -1
log "oracle sql dump + x1 sanity run of the trio"
sbt -batch "runMain graft.Verify $X1 $VOUT q_pagerank,q_bigram_logprob,q_triangle_count" 2>&1 | tail -1

AB_TMP=$(mktemp)
ab_pass() { # query dir
  sbt -batch "runMain graft.WeakRecert $1 $2" 2>&1 |
    grep -o '{"metric":"weak_recert".*' >> "$AB_TMP"
  python3 scripts/ab_oracle.py "$1" "$2" "$VOUT" >> "$AB_TMP"
}
for dir in $X1 $X10; do
  for q in q_pagerank q_bigram_logprob q_triangle_count; do
    log "A/B $q $dir pass 1"; ab_pass "$q" "$dir"
    log "A/B $q $dir pass 2"; ab_pass "$q" "$dir"
  done
done
python3 - "$AB_TMP" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
json.dump({"metric": "r11_x10_ab", "protocol": "S/D/S/D, warmupx2+min5 per pass",
           "rows": rows}, open("SCALING_R11_AB.json", "w"), indent=1)
EOF

RC_TMP=$(mktemp)
for q in q_paragraph_dedup q_anomaly_zscore q_ann_recall q_bpe_encode; do
  log "recert $q pass 1"
  sbt -batch "runMain graft.WeakRecert $q /root/testdata/sf0.1" 2>&1 |
    grep -o '{"metric":"weak_recert".*' >> "$RC_TMP"
  python3 scripts/ab_oracle.py "$q" /root/testdata/sf0.1 "$VOUT" >> "$RC_TMP"
  log "recert $q pass 2"
  sbt -batch "runMain graft.WeakRecert $q /root/testdata/sf0.1" 2>&1 |
    grep -o '{"metric":"weak_recert".*' >> "$RC_TMP"
  python3 scripts/ab_oracle.py "$q" /root/testdata/sf0.1 "$VOUT" >> "$RC_TMP"
done
python3 - "$RC_TMP" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
json.dump({"metric": "r11_recert", "protocol": "S/D/S/D, warmupx2+min5 per pass",
           "rows": rows}, open("SCALING_R11_RECERT.json", "w"), indent=1)
EOF
log "done"
