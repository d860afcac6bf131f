#!/bin/bash
# r15: decade rows for q231-q234 (video near-dup, media QA batch +
# stream, video cluster dedup). Fresh JVM per row; DONE only on rc=0.
#
# q231 has NO x1000 row BY DESIGN: the 1000x corpus is 1000-replica
# families whose scene sequences coincide, so the true near-dup pair
# list is Θ(dups²) (measured: Σdf² ≈ 1.4e10 candidate rows — the run
# disk-filled, q231b first attempt). That regime routes to q234's
# cluster reduction, whose x1000 row IS here — the q225↔q224 split
# applied to video.
cd /root/repo
OUT=target/probe_r15/q231b.log
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
export SNAP_CP=/root/repo/target/probe_r15/classes_v4
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

step q231_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q231_video_near_dup
step q231_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q231_video_near_dup
step q231_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q231_video_near_dup
step q232_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q232_media_qa_report
step q232_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q232_media_qa_report
step q232_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q232_media_qa_report
step q232_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q232_media_qa_report
step q233_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q233_stream_media_qa
step q233_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q233_stream_media_qa
step q233_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q233_stream_media_qa
step q234_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q234_video_dedup
step q234_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q234_video_dedup
step q234_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q234_video_dedup
step q234_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q234_video_dedup
echo ALLDONE >> "$OUT"
