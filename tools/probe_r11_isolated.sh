#!/bin/bash
# Isolated fresh-JVM noop baselines (PLANS.md r10-forward table):
# re-probe plan-changed queries + the r11 additions.
cd /root/repo
OUT=target/probe_r11/isolated.jsonl
touch "$OUT"
for q in q179_novelty_score q177_bm25_topk q176_incremental_index_dedup q185_stream_index_ingest q186_pq_adc_topk q187_chunk_overlap q188_hard_negatives q189_int8_quantize; do
  grep -q "\"$q\"" "$OUT" && continue
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SNAP_CP=/root/repo/target/probe_r11/classes2 \
    tools/runj_snap.sh graft.Bench "$q" 2>/dev/null | grep '"metric"' >> "$OUT"
done
echo done >> "$OUT"
