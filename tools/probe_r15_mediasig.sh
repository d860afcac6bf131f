#!/bin/bash
# r15: decade rows for the multimodal family RE-MEASURED after the
# MediaSig fusion (dHash / frame signatures now single-pass codegen'd
# expressions — the per-byte Generate and its pivoted aggregates are
# gone from every plan). Same corpora and instrument as the r14
# fused.log rows it supersedes. Fresh JVM per row. Resume-aware.
#
# r14 ADVICE fixes baked in: DONE is written ONLY when the measured
# command exits 0 (a failed row re-measures on re-run instead of
# masquerading as complete), and the rc recorded in the WALL line is
# captured immediately after the command, not after a substitution.
cd /root/repo
OUT=target/probe_r15/mediasig.log
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
export SNAP_CP=/root/repo/target/probe_r15/classes_v1
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

step q225m_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q225_phash_dedup
step q225m_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q225_phash_dedup
step q225m_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q225_phash_dedup
step q225m_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q225_phash_dedup
step q224m_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q224_phash_near_dup
step q224m_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q224_phash_near_dup
step q224m_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q224_phash_near_dup
step q226m_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q226_scene_segments
step q226m_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q226_scene_segments
step q226m_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q226_scene_segments
step q229m_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q229_stream_phash_dedup
step q229m_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q229_stream_phash_dedup
step q229m_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q229_stream_phash_dedup
echo ALLDONE >> "$OUT"
