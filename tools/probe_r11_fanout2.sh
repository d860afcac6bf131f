#!/bin/bash
# Metric-capturing delta probes (classes2 snapshot has the fixed
# scanMetrics): alternate default/raised twice each to de-confound
# page-cache warmth.
cd /root/repo
OUT=target/probe_r11/fanout_metrics.log
: > "$OUT"
export SPARK_GRAFT_CPUS=32 JAVA_EXTRA=-Xmx24g SNAP_CP=/root/repo/target/probe_r11/classes2
R=tools/runj_snap.sh
for rep in 1 2; do
  for cfg in default raised; do
    echo "=== rep$rep delta500_1000x_$cfg ===" >> "$OUT"
    $R graft.tools.IndexProbe delta /root/testdata/sf0.01 target/probe_r11/idx1000_$cfg 2>/dev/null | grep indexprobe >> "$OUT"
  done
done
echo ALLDONE >> "$OUT"
