#!/bin/bash
# r16 tail probe: x1000 embeddings tier for the ANN-index family.
cd /root/repo
OUT=target/probe_r16/probe4.log
touch "$OUT"
export JAVA_EXTRA=-Xmx24g SPARK_GRAFT_CPUS=32
export SNAP_CP=/root/repo/target/probe_r16/classes_v5
if [ ! -e target/sf1x1000_emb/embeddings.parquet/_SUCCESS ]; then
  echo "=== gen x1000emb ===" >> "$OUT"
  GRAFT_SCALE_JITTER=0.05 tools/runj_snap.sh graft.tools.Scale \
    /root/testdata/sf0.1 target/sf1x1000_emb 1000 embeddings >> "$OUT" 2>&1
  echo "WALL gen rc=$?" >> "$OUT"
fi
for q in q238_stream_ann_ingest q242_ann_index_topk; do
  echo "=== $q x1000emb ===" >> "$OUT"
  t0=$(date +%s)
  SPARK_GRAFT_SF_DIR=target/sf1x1000_emb tools/runj_snap.sh graft.Bench $q >> "$OUT" 2>&1
  rc=$?
  echo "WALL $q $(( $(date +%s) - t0 )) s rc=$rc" >> "$OUT"
done
echo ALLDONE >> "$OUT"
