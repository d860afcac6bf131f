#!/bin/bash
# r17 decade probes: the re-measured x1000 rows (q241 hashed verify,
# q239 asym route, q245 both regimes), the q224 expansion-route x100
# re-measure, new-operator rows (q247/q248), and code-vs-code checks
# on the ANN family after the epoch-partition change. Resume-aware
# (DONE markers only on rc=0); SNAPSHOT classes dir so sbt can compile
# concurrently — but do NOT start sbt/Verify while a timed row runs.
cd /root/repo
mkdir -p target/probe_r17
OUT=target/probe_r17/probe.log
touch "$OUT"
export JAVA_EXTRA=${JAVA_EXTRA:--Xmx24g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
SNAP=/root/repo/target/probe_r17/classes_v1
[ -d "$SNAP" ] || cp -r target/scala-2.13/classes "$SNAP"

step() {
  local label="$1" sfdir="$2"; shift 2
  grep -q "^DONE $label$" "$OUT" && { echo "SKIP $label" ; return; }
  echo "=== $label ===" >> "$OUT"
  df / | tail -1 >> "$OUT"
  local t0=$(date +%s)
  SNAP_CP="$SNAP" SPARK_GRAFT_SF_DIR="$sfdir" "$@" >> "$OUT" 2>&1
  local rc=$?
  local t1=$(date +%s)
  echo "WALL $label $(( t1 - t0 )) s rc=$rc" >> "$OUT"
  df / | tail -1 >> "$OUT"
  [ $rc -eq 0 ] && echo "DONE $label" >> "$OUT"
}

R=tools/runj_snap.sh

# --- quick rows first: new operators + ANN-family code-vs-code
step q247_z100     target/zipf_z100    $R graft.Bench q247_ann_index_split
step q247_x100emb  target/sf1x100_emb  $R graft.Bench q247_ann_index_split
step q248_z100     target/zipf_z100    $R graft.Bench q248_crossmodal_retrieval
step q248_x100mm   target/sf1x100_mm   $R graft.Bench q248_crossmodal_retrieval
step q238_x100emb  target/sf1x100_emb  $R graft.Bench q238_stream_ann_ingest
step q242_x100emb  target/sf1x100_emb  $R graft.Bench q242_ann_index_topk
step q244_x100emb  target/sf1x100_emb  $R graft.Bench q244_ann_index_health

# --- high-cell-count index build/probe (verdict item 2 evidence)
step annscale_x100emb target/sf1x100_emb $R graft.tools.AnnScaleProbe target/sf1x100_emb 8 64 256

# --- q224 expansion route on the replica tier (vs r16's 17.3 s
# representative-only row; output now the full pair list)
step q224_x100     target/sf1x100_doc  $R graft.Bench q224_phash_near_dup

# --- cross-modal x100 re-measures (asym route may fire at x100's
# sig ratio 13.7; r16 rows: q239 42.1 s, q245 ~73.8 s decomposed)
step q239_x100     target/sf1x100_doc  $R graft.Bench q239_crossmodal_pairs
step q245_x100     target/sf1x100_doc  $R graft.Bench q245_crossmodal_dedup_clusters
step q239_z100     target/zipf_z100    $R graft.Bench q239_crossmodal_pairs

# --- the r16-REFUSED x1000 rows, re-measured (watch df!)
step q241_x1000    target/sf1x1000_doc $R graft.Bench q241_epoch_dedup_select
step q245_x1000    target/sf1x1000_doc $R graft.Bench q245_crossmodal_dedup_clusters
step q239_x1000    target/sf1x1000_doc $R graft.Bench q239_crossmodal_pairs

# --- the clone-heavy x1000 regime (exact replicas; q245's star-edge
# route is the operator a dedup pipeline runs there)
step q245_x1000c   target/sf1x1000_clone $R graft.Bench q245_crossmodal_dedup_clusters

echo ALLDONE >> "$OUT"
