#!/bin/bash
# Isolated fresh-JVM noop baselines for the r12 LangModel module
# (q214-q219). Same protocol as probe_r12_isolated.sh; resume-aware.
cd /root/repo
OUT=target/probe_r12/isolated_c.jsonl
touch "$OUT"
mkdir -p target/probe_r12
[ -d target/probe_r12/classes_c ] || cp -r target/scala-2.13/classes target/probe_r12/classes_c
for q in q214_kn_bigram_lm q215_kn_heldout_ppl q216_bpe_train q217_bpe_tokenize q218_cluster_balanced_keep q219_stream_classifier_gate; do
  grep -q "\"$q\"" "$OUT" && continue
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 JAVA_EXTRA=-Xmx24g \
    SNAP_CP=/root/repo/target/probe_r12/classes_c \
    tools/runj_snap.sh graft.Bench "$q" 2>/dev/null | grep '"metric"' >> "$OUT"
done
echo done >> "$OUT"
