#!/bin/bash
# r14: q225 exact-signature cluster reduction — the LINEAR row in the
# dup-heavy adversarial regime where q224's pair list is Θ(dups²) by
# definition (the deliberately-killed q224_x1000 step): 5M replica
# docs collapse through one signature groupBy + join-back. Plus the
# zipf realistic rows for the same operator.
cd /root/repo
OUT=target/probe_r14/q225.log
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
export SNAP_CP=/root/repo/target/probe_r14/classes_v4
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

step q225_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q225_phash_dedup
step q225_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q225_phash_dedup
step q225_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q225_phash_dedup
step q225_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q225_phash_dedup
echo ALLDONE >> "$OUT"
