#!/bin/bash
# r15: regenerate the probe corpora (target/ was cleaned). Same
# program as the r14 generator; differences: runs against a SNAPSHOT
# classes dir so sbt can compile concurrently, and the WALL line's rc
# is captured immediately after the generator exits (the r14 script
# read $? after a $(date +%s) substitution, so it always logged rc=0
# — the r14 ADVICE item).
cd /root/repo
mkdir -p target/probe_r15
OUT=target/probe_r15/gen.log
touch "$OUT"
step() {
  local label="$1" dir="$2"; shift 2
  [ -e "$dir/documents.parquet/_SUCCESS" ] && { echo "SKIP $label" >> "$OUT"; return; }
  echo "=== $label ===" >> "$OUT"
  local t0=$(date +%s)
  "$@" >> "$OUT" 2>&1
  local rc=$?
  local t1=$(date +%s)
  echo "WALL $label $(( t1 - t0 )) s rc=$rc" >> "$OUT"
}
export JAVA_EXTRA=-Xmx24g
export SNAP_CP=/root/repo/target/probe_r15/classes_v1
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh
step x100_doc  target/sf1x100_doc  $R graft.tools.Scale /root/testdata/sf0.1 target/sf1x100_doc 100 documents
step x1000_doc target/sf1x1000_doc $R graft.tools.Scale /root/testdata/sf0.1 target/sf1x1000_doc 1000 documents
step z100 target/zipf_z100 $R graft.tools.ZipfGen target/zipf_z100 500000 200000 64 13
echo ALLDONE >> "$OUT"
