#!/bin/bash
# BM25 pruning-dial probe at 10x docs: exact vs maxDfFrac 0.3 / 0.1.
cd /root/repo
OUT=target/probe_r11/bm25_dial.jsonl
touch "$OUT"
probe() {
  local label="$1"; shift
  grep -q "\"$label\"" "$OUT" 2>/dev/null && return
  local line=$(env "$@" SPARK_GRAFT_SF_DIR=target/sf1x10_doc SPARK_GRAFT_CPUS=32 JAVA_EXTRA=-Xmx24g \
    SNAP_CP=/root/repo/target/probe_r11/classes2 \
    tools/runj_snap.sh graft.Bench q177_bm25_topk 2>/dev/null | grep '"metric"')
  echo "{\"label\":\"$label\",\"bench\":$line}" >> "$OUT"
}
probe exact_x10
probe dial03_x10 GRAFT_BM25_MAXDF=0.3
probe dial01_x10 GRAFT_BM25_MAXDF=0.1
echo done >> "$OUT"
