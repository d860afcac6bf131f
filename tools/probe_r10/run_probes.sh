#!/bin/bash
# Isolated fresh-JVM noop probes, resume-aware: skips queries already
# present in isolated.jsonl.
cd /root/repo
OUT=/root/repo/target/probe_r10/isolated.jsonl
touch "$OUT"
QUERIES=$(sed -n '/val headline/,/q185_stream_index_ingest/p' src/main/scala/graft/Bench.scala | grep -o '"q[^"]*"' | tr -d '"')
for q in $QUERIES; do
  grep -q "\"$q\"" "$OUT" && continue
  echo "[probe] $q" >&2
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    tools/runj.sh graft.Bench "$q" 2>/dev/null | grep '"metric"' >> "$OUT"
done
echo "[probe] done: $(wc -l < "$OUT") lines" >&2
