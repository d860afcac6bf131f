#!/bin/bash
# Isolated fresh-JVM noop baselines for the r12 Quality module
# (q208-q213). Same protocol as probe_r12_isolated.sh; resume-aware.
cd /root/repo
OUT=target/probe_r12/isolated_b.jsonl
touch "$OUT"
mkdir -p target/probe_r12
[ -d target/probe_r12/classes_b ] || cp -r target/scala-2.13/classes target/probe_r12/classes_b
for q in q208_gopher_rules q209_shard_manifest q210_psi_drift \
         q211_quality_canonical q212_quality_logreg q213_classifier_gate; do
  grep -q "\"$q\"" "$OUT" && continue
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 JAVA_EXTRA=-Xmx24g \
    SNAP_CP=/root/repo/target/probe_r12/classes_b \
    tools/runj_snap.sh graft.Bench "$q" 2>/dev/null | grep '"metric"' >> "$OUT"
done
echo done >> "$OUT"
