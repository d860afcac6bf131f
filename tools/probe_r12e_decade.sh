#!/bin/bash
# Decade probes (10x/100x docs) for the r12 CorpusStats + Quality
# families (q201-q213) and the q220 isolated baseline — the q219
# 100x overflow catch shows every new family needs its decade row.
# Resume-aware.
cd /root/repo
OUT=target/probe_r12/decade_e.log
touch "$OUT"
step() {
  local label="$1"; shift
  grep -q "^DONE $label$" "$OUT" && return
  echo "=== $label ===" >> "$OUT"
  "$@" 2>/dev/null | grep '"metric"' >> "$OUT"
  echo "DONE $label" >> "$OUT"
}
export SPARK_GRAFT_CPUS=32
export JAVA_EXTRA=-Xmx24g
export SNAP_CP=/root/repo/target/probe_r12/classes_c
R=tools/runj_snap.sh
step q220_moore_lewis_iso env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q220_moore_lewis
for q in q201_stratified_sample q202_vocab_stats q203_freq_spectrum \
         q204_sif_embeddings q205_source_overlap q206_source_minhash_sim \
         q208_gopher_rules q209_shard_manifest q210_psi_drift \
         q211_quality_canonical q212_quality_logreg q213_classifier_gate \
         q220_moore_lewis; do
  for sc in 10 100; do
    step ${q}_x${sc} env SPARK_GRAFT_SF_DIR=target/sf1x${sc}_doc $R graft.Bench $q
  done
done
echo ALLDONE >> "$OUT"
