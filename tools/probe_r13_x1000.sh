#!/bin/bash
# r13 verdict items 2 + 8: extend the 1000x sweep (5M replica docs /
# 2M replica vectors) to the families r12 left unprobed past 100x —
# q211 (LSH+Pregel canonicalization, the most expensive decade row),
# q205/q206 (source overlap), q215 (held-out ppl), q218 (cluster-
# balanced keep, needs embeddings), and q193's sealed-window shape.
# Fresh JVM per row, noop sink via graft.Bench. Resume-aware.
cd /root/repo
OUT=target/probe_r13/x1000.log
touch "$OUT"
step() {
  local label="$1"; shift
  grep -q "^DONE $label$" "$OUT" && return
  echo "=== $label ===" >> "$OUT"
  local t0=$(date +%s)
  "$@" >> "$OUT" 2>&1
  echo "WALL $label $(( $(date +%s) - t0 )) s" >> "$OUT"
  echo "DONE $label" >> "$OUT"
}
export SPARK_GRAFT_CPUS=32
export JAVA_EXTRA=-Xmx32g
export SNAP_CP=/root/repo/target/probe_r13/classes_v2
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh
# q218 needs documents + embeddings at the same multiplier
mkdir -p target/sf1x1000_both target/sf1x100_both
ln -sf /root/repo/target/sf1x1000_doc/documents.parquet target/sf1x1000_both/documents.parquet
ln -sf /root/repo/target/sf1x1000_emb/embeddings.parquet target/sf1x1000_both/embeddings.parquet
ln -sf /root/repo/target/sf1x100_doc/documents.parquet target/sf1x100_both/documents.parquet
ln -sf /root/repo/target/sf1x100_emb/embeddings.parquet target/sf1x100_both/embeddings.parquet
for q in q205_source_overlap q215_kn_heldout_ppl q193_stream_trending_terms; do
  step ${q}_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench $q
done
step q218_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_both  $R graft.Bench q218_cluster_balanced_keep
step q218_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_both $R graft.Bench q218_cluster_balanced_keep
step q211_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc  $R graft.Bench q211_quality_canonical
# verdict item 8: q193's sealed-window shape at 1000x with
# per-operator state rows recorded (eviction must hold when
# windows x vocab is genuinely large)
step q193_state_x1000 $R graft.tools.StreamProbe target/sf1x1000_doc q193_stream_trending_terms
echo ALLDONE >> "$OUT"
