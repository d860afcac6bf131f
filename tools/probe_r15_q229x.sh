#!/bin/bash
# r15: q229 dup-heavy decade rows after the find() early-exit — the
# x1000-replica corpus is exactly the regime the optimization targets
# (replica families share buckets; the representative sorts early).
# Also re-rows x100/z100 on the new code for a same-instrument line.
cd /root/repo
OUT=target/probe_r15/q229x.log
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
export SNAP_CP=/root/repo/target/probe_r15/classes_v5
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

step q229f_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q229_stream_phash_dedup
step q229f_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench q229_stream_phash_dedup
step q229f_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q229_stream_phash_dedup
step q136f_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q136_stream_dedup_minhash
echo ALLDONE >> "$OUT"
