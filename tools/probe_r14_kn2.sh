#!/bin/bash
# r14 follow-up: the ABSOLUTE model cap (GRAFT_KN_MAXTYPES) in the
# vocab~N adversarial regime. minCount=2 measured 249 s at x1000 (off:
# see kn.log) — a real cut but not a complexity change, because
# replica suffixing manufactures vocab-proportional TYPES at every
# count level. maxTypes bounds the model and broadcast-hints every
# scoring build side; rows at 100x/1000x, fresh JVM each.
cd /root/repo
OUT=target/probe_r14/kn2.log
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
export SNAP_CP=/root/repo/target/probe_r14/classes_v6
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh
step q222_x100_cap  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  GRAFT_KN_MAXTYPES=1000000 $R graft.Bench q222_doremi_weights
step q222_x1000_cap env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc GRAFT_KN_MAXTYPES=1000000 $R graft.Bench q222_doremi_weights
echo ALLDONE >> "$OUT"
