#!/bin/bash
# Isolated fresh-JVM noop baselines (PLANS.md r10-forward table):
# the q193 rework + the r11 tail (q196-q200) + the r12 additions
# (q201-q207). Resume-aware.
cd /root/repo
OUT=target/probe_r12/isolated.jsonl
touch "$OUT"
for q in q193_stream_trending_terms q196_winnowing_pairs q197_segment_dedup \
         q198_mmr_diversified q199_temperature_mix q200_rotated_pq_topk \
         q201_stratified_sample q202_vocab_stats q203_freq_spectrum \
         q204_sif_embeddings q205_source_overlap q206_source_minhash_sim \
         q207_ann_recall; do
  grep -q "\"$q\"" "$OUT" && continue
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 JAVA_EXTRA=-Xmx24g \
    SNAP_CP=/root/repo/target/probe_r12/classes \
    tools/runj_snap.sh graft.Bench "$q" 2>/dev/null | grep '"metric"' >> "$OUT"
done
echo done >> "$OUT"
