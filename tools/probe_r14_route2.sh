#!/bin/bash
# r14 follow-up: the routed q205 path RE-MEASURED after the md5->xxhash64
# permutation fix (the first routed x1000 run measured 355 s — 16 md5
# digests per distinct gram WAS the wall in the all-unique-grams replica
# regime; the routed path has no oracle to mirror, so the md5 parity
# device bought nothing). Rows: routed x100/x1000 replica + routed z100
# (realistic regime), fresh JVM each.
cd /root/repo
OUT=target/probe_r14/route2.log
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
export SNAP_CP=/root/repo/target/probe_r14/classes_v5
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

step q205r2_routed_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  GRAFT_OVERLAP_ROUTE_CHARS=0 $R graft.Bench q205_source_overlap
step q205r2_routed_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q205_source_overlap
step q205r2_routed_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    GRAFT_OVERLAP_ROUTE_CHARS=0 $R graft.Bench q205_source_overlap
step q205r2_exact_z100   env SPARK_GRAFT_SF_DIR=target/zipf_z100    GRAFT_OVERLAP_ROUTE_CHARS=999999999999 $R graft.Bench q205_source_overlap
echo ALLDONE >> "$OUT"
