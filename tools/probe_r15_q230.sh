#!/bin/bash
# r15: decade rows for q230 (audio energy/silence segmentation).
# Fresh JVM per row; DONE markers only on rc=0.
cd /root/repo
OUT=target/probe_r15/q230.log
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
export SNAP_CP=/root/repo/target/probe_r15/classes_v2
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

step q230_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q230_audio_segments
step q230_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q230_audio_segments
step q230_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q230_audio_segments
step q230_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q230_audio_segments
echo ALLDONE >> "$OUT"
