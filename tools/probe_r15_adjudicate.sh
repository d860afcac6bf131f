#!/bin/bash
# r15 close follow-up: the v3 recheck confirmed q167/q188/q218 as
# same-data regressions, but none of their code paths changed this
# round and their isolated numbers exceeded their in-suite numbers —
# the environment-drift signature. Adjudicate code-vs-environment:
# run the three flagged queries AND three untouched controls under
# BOTH the r15 classes and the r14-close classes (worktree build at
# the r14 baseline sha) on today's data, fresh JVM per row, idle box.
cd /root/repo
OUT=target/probe_r15/adjudicate.log
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
export JAVA_EXTRA=-Xmx24g
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
R=tools/runj_snap.sh
NEW=/root/repo/target/probe_r15/classes_close
OLD=/root/repo/target/recheck_wt/target/scala-2.13/classes

# baseline build (idempotent): the r14-close code
step wt_build bash -c '
  [ -d target/recheck_wt/target/scala-2.13/classes ] && exit 0
  git worktree remove --force target/recheck_wt 2>/dev/null
  git worktree add --force target/recheck_wt ac10d963a &&
  cd target/recheck_wt && sbt -batch compile'

for q in q167_semdedup q188_hard_negatives q218_cluster_balanced_keep \
         q56c_simhash_byte_blocked q177_bm25_topk q135_ann_ivf_kmeans; do
  step new_$q env SNAP_CP=$NEW $R graft.Bench $q
  step old_$q env SNAP_CP=$OLD $R graft.Bench $q
done
echo ALLDONE >> "$OUT"
