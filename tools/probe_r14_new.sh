#!/bin/bash
# r14: decade rows for the round's second operator batch (q226 scene
# segmentation, q227 tokenizer fertility, q228 RHO excess-loss
# selection), both regimes where they differ. q228 shares the KN
# family's vocab~N adversarial bound (the bigram model is corpus-sized
# on replica-suffixed corpora), so its replica-1000x row runs WITH the
# maxTypes cap (the production dial) next to a dial-off 100x row;
# Zipf rows are the realistic regime. Fresh JVM per row via
# graft.Bench (noop sink, median-of-3 after warm-up). Resume-aware.
cd /root/repo
OUT=target/probe_r14/new.log
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
export SNAP_CP=/root/repo/target/probe_r14/classes_v7
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

for q in q226_scene_segments q227_tokenizer_fertility; do
  step ${q}_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench $q
  step ${q}_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench $q
  step ${q}_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench $q
  step ${q}_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100    $R graft.Bench $q
done

step q228_sf01 env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q228_rho_select
step q228_x100 env SPARK_GRAFT_SF_DIR=target/sf1x100_doc   $R graft.Bench q228_rho_select
step q228_z100 env SPARK_GRAFT_SF_DIR=target/zipf_z100     $R graft.Bench q228_rho_select
# the KN-family adversarial tier, capped (the q222 kn2 pattern)
step q228_x1000_cap env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc GRAFT_KN_MAXTYPES=1000000 $R graft.Bench q228_rho_select
echo ALLDONE >> "$OUT"
