#!/bin/bash
# 1000x-docs (5M replica docs) rows for the r12 families' heavy or
# overflow-prone members — the regime that caught the q212 LONG
# overflow at 100x. Resume-aware.
cd /root/repo
OUT=target/probe_r12/decade_f.log
touch "$OUT"
step() {
  local label="$1"; shift
  grep -q "^DONE $label$" "$OUT" && return
  echo "=== $label ===" >> "$OUT"
  "$@" 2>/dev/null | grep '"metric"' >> "$OUT"
  echo "DONE $label" >> "$OUT"
}
export SPARK_GRAFT_CPUS=32
export JAVA_EXTRA=-Xmx32g
export SNAP_CP=/root/repo/target/probe_r12/classes_c
R=tools/runj_snap.sh
for q in q208_gopher_rules q212_quality_logreg q214_kn_bigram_lm \
         q217_bpe_tokenize q220_moore_lewis q221_curation_build \
         q206_source_minhash_sim; do
  step ${q}_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench $q
done
echo ALLDONE >> "$OUT"
