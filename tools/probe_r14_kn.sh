#!/bin/bash
# r14 verdict item 6: the GRAFT_KN_MINCOUNT dial in the vocab~N
# adversarial regime. Replica suffixing makes almost every bigram a
# singleton, so the KN count table grows corpus-sized (q222's r13
# replica-1000x wall, 336 s, 28x last decade); minCount=2 collapses
# the model to the shared-structure core. Rows: q222 at 100x/1000x,
# dial off vs on, fresh JVM each (graft.Bench noop-sink median-of-3).
cd /root/repo
OUT=target/probe_r14/kn.log
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
export SNAP_CP=/root/repo/target/probe_r14/classes_v2
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

step q222_x100_off env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q222_doremi_weights
step q222_x100_on  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  GRAFT_KN_MINCOUNT=2 $R graft.Bench q222_doremi_weights
step q222_x1000_on  env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc GRAFT_KN_MINCOUNT=2 $R graft.Bench q222_doremi_weights
step q222_x1000_off env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q222_doremi_weights
echo ALLDONE >> "$OUT"
