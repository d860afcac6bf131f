#!/bin/bash
# PQ / IVF-PQ decade probes on scaled embeddings.
cd /root/repo
OUT=target/probe_r11/pq_scale.jsonl
touch "$OUT"
probe() {
  local label="$1" dir="$2" q="$3" mem="${4:--Xmx24g}"
  grep -q "\"$label\"" "$OUT" 2>/dev/null && return
  local line=$(SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 JAVA_EXTRA=$mem \
    SNAP_CP=/root/repo/target/probe_r11/classes2 \
    tools/runj_snap.sh graft.Bench "$q" 2>/dev/null | grep '"metric"')
  echo "{\"label\":\"$label\",\"bench\":$line}" >> "$OUT"
}
probe pq_x1     /root/testdata/sf0.1     q186_pq_adc_topk
probe pq_x100   target/sf1x100_emb       q186_pq_adc_topk
probe pq_x1000  target/sf1x1000_emb      q186_pq_adc_topk -Xmx32g
probe ivfpq_x1    /root/testdata/sf0.1   q190_ivfpq_topk
probe ivfpq_x100  target/sf1x100_emb     q190_ivfpq_topk
probe ivfpq_x1000 target/sf1x1000_emb    q190_ivfpq_topk -Xmx32g
echo done >> "$OUT"
