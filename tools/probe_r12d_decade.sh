#!/bin/bash
# Decade probes for the r12 LangModel + selection/serving operators:
# fresh-JVM noop bench at 10x and 100x docs (replica-suffixed corpora
# from tools/Scale — vocab grows ~linearly with replicas, so q214/q216
# exercise vocab growth, not just row growth) and 100x/1000x
# embeddings for q218. Resume-aware.
cd /root/repo
OUT=target/probe_r12/decade_d.log
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
for q in q214_kn_bigram_lm q215_kn_heldout_ppl q216_bpe_train \
         q217_bpe_tokenize q219_stream_classifier_gate; do
  for sc in 10 100; do
    step ${q}_x${sc} env SPARK_GRAFT_SF_DIR=target/sf1x${sc}_doc $R graft.Bench $q
  done
done
step q218_cluster_balanced_keep_x100 env SPARK_GRAFT_SF_DIR=target/sf1x100_emb \
  $R graft.Bench q218_cluster_balanced_keep
step q218_cluster_balanced_keep_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_emb \
  JAVA_EXTRA=-Xmx32g $R graft.Bench q218_cluster_balanced_keep
echo ALLDONE >> "$OUT"
