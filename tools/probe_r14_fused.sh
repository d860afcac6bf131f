#!/bin/bash
# r14 follow-up: (a) q224/q225 decade rows RE-MEASURED after the phash
# fusion (32 cell means pivoted into one hash aggregate — the first
# cut's grid join + lead() window sort-spilled at the 1000x tier:
# q225 16.2 -> 183.6 s last decade); (b) the q222 x1000 same-data
# adjudication — today's dial-off wall (59.0 s) is 5.7x below the r13
# row (336 s), so the r13-close classes re-run on TODAY's corpus to
# split code from data/environment. Fresh JVM per row. Resume-aware.
cd /root/repo
OUT=target/probe_r14/fused.log
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
export SNAP_CP=/root/repo/target/probe_r14/classes_v8
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

step q225f_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q225_phash_dedup
step q225f_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q225_phash_dedup
step q225f_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q225_phash_dedup
step q225f_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q225_phash_dedup
step q224f_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q224_phash_near_dup
step q224f_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q224_phash_near_dup
step q224f_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q224_phash_near_dup

# (b) same-data adjudication: r13-close classes on today's x1000 corpus
step q222_x1000_r13code env SNAP_CP=/root/repo/target/wt_r13/target/scala-2.13/classes \
  SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q222_doremi_weights

# (c) gate_h10 re-run at idle: the first row (full=35.5 s vs h100's
# 18.8 s on 10x the docs) started seconds after a 55 GB spill cleanup
step gate_h10_rerun $R graft.tools.GateProbe target/zipf_h10 0.1

# (d) q226 x1000 re-run at idle: the first row's warm-up overlapped a
# duplicate runner for ~7 of its 14 minutes
step q226_x1000_rerun env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q226_scene_segments
echo ALLDONE >> "$OUT"
