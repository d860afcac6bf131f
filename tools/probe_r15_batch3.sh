#!/bin/bash
# r15 batch 3: decade rows for q235 (landmark alignment), q236 (vocab
# coverage), q237 (embedding drift). Fresh JVM per row; DONE on rc=0.
# q237's scaled rows use the zipf corpora (embeddings regenerate with
# them); the replica corpora are documents-only, so x-tiers for q237
# ride z100.
cd /root/repo
OUT=target/probe_r15/batch3.log
mkdir -p target/probe_r15
touch "$OUT"
step() {
  local label="$1"; shift
  grep -q "^DONE $label$" "$OUT" && return
  echo "=== $label ===" >> "$OUT"
  local t0=$(date +%s)
  "$@" >> "$OUT" 2>&1
  local rc=$?
  local t1=$(date +%s)
  echo "WALL $label $(( t1 - t0 )) s rc=$rc" >> "$OUT"
  [ $rc -eq 0 ] && echo "DONE $label" >> "$OUT"
}
export SPARK_GRAFT_CPUS=32
export JAVA_EXTRA=-Xmx32g
export SNAP_CP=/root/repo/target/probe_r15/classes_v6
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

# q235 has no REPLICA-corpus rows (x100/x1000) BY DESIGN: replica
# families share landmark keys, so the true vote list is quadratic in
# replica count (measured: the x100 attempt spilled 21 GB before it
# was killed — the q231 regime exactly); dup-heavy corpora route
# through q234's cluster reduction BEFORE alignment, and the organic
# z100 row below is the honest scale tier for this operator.
step q235_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q235_media_align
step q235_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q235_media_align
step q236_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q236_vocab_coverage
step q236_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q236_vocab_coverage
step q236_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q236_vocab_coverage
step q236_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q236_vocab_coverage
step q237_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q237_embed_drift_psi
step q237_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q237_embed_drift_psi
echo ALLDONE >> "$OUT"
