#!/bin/bash
# q179 novelty decade probe after the agg refactor: fresh JVM per dir,
# Bench discards run 1, reports median of 3.
cd /root/repo
OUT=target/probe_r11/q179_scale.jsonl
touch "$OUT"
probe() {
  local label="$1" dir="$2"
  grep -q "\"$label\"" "$OUT" 2>/dev/null && return
  local line=$(SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 JAVA_EXTRA=-Xmx24g \
    tools/runj_snap.sh graft.Bench q179_novelty_score 2>/dev/null | grep '"metric"')
  echo "{\"label\":\"$label\",\"bench\":$line}" >> "$OUT"
}
probe x1   /root/testdata/sf0.1
probe x10  target/sf1x10_doc
probe x100 target/sf1x100_doc
echo done >> "$OUT"
