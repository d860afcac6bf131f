#!/bin/bash
# r16 decade probes: new operators (q238-q241), the q235 guard
# re-measures, and the q224 code-vs-code adjudication row. Resume-aware
# (DONE markers written only on rc=0, rc captured immediately); runs
# against a SNAPSHOT classes dir so sbt can compile concurrently —
# but do NOT start sbt/Verify while a timed row is running.
cd /root/repo
mkdir -p target/probe_r16
OUT=target/probe_r16/probe.log
touch "$OUT"
export JAVA_EXTRA=${JAVA_EXTRA:--Xmx24g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
SNAP_V3=/root/repo/target/probe_r16/classes_v3
[ -d "$SNAP_V3" ] || cp -r target/scala-2.13/classes "$SNAP_V3"

step() {
  local label="$1" sfdir="$2" snap="$3"; shift 3
  grep -q "^DONE $label$" "$OUT" && { echo "SKIP $label" ; return; }
  echo "=== $label ===" >> "$OUT"
  local t0=$(date +%s)
  SNAP_CP="$snap" SPARK_GRAFT_SF_DIR="$sfdir" "$@" >> "$OUT" 2>&1
  local rc=$?
  local t1=$(date +%s)
  echo "WALL $label $(( t1 - t0 )) s rc=$rc" >> "$OUT"
  [ $rc -eq 0 ] && echo "DONE $label" >> "$OUT"
}

R=tools/runj_snap.sh

# 100x embeddings corpus (jittered replicas — exact copies degenerate
# distance ties, the r13 lesson) for q238's replica-regime row
if [ ! -e target/sf1x100_emb/embeddings.parquet/_SUCCESS ]; then
  echo "=== gen x100emb ===" >> "$OUT"
  GRAFT_SCALE_JITTER=0.05 SNAP_CP="$SNAP_V3" $R graft.tools.Scale \
    /root/testdata/sf0.1 target/sf1x100_emb 100 embeddings >> "$OUT" 2>&1
  echo "WALL gen-x100emb rc=$?" >> "$OUT"
fi

# --- new operators: scaled decade rows (both regimes where data exists)
step q238_z100    target/zipf_z100    "$SNAP_V3" $R graft.Bench q238_stream_ann_ingest
step q238_x100emb target/sf1x100_emb  "$SNAP_V3" $R graft.Bench q238_stream_ann_ingest
step q239_x100    target/sf1x100_doc  "$SNAP_V3" $R graft.Bench q239_crossmodal_pairs
step q239_z100    target/zipf_z100    "$SNAP_V3" $R graft.Bench q239_crossmodal_pairs
step q240_x100    target/sf1x100_doc  "$SNAP_V3" $R graft.Bench q240_contamination_attribution
step q240_z100    target/zipf_z100    "$SNAP_V3" $R graft.Bench q240_contamination_attribution
step q240_x1000   target/sf1x1000_doc "$SNAP_V3" $R graft.Bench q240_contamination_attribution
step q241_x100    target/sf1x100_doc  "$SNAP_V3" $R graft.Bench q241_epoch_dedup_select
step q241_z100    target/zipf_z100    "$SNAP_V3" $R graft.Bench q241_epoch_dedup_select

# --- q235 guard re-measures: exact path (budget forced high) on z100,
# and the replica regime (suffixed replicas share landmark keys)
step q235_z100_exact target/zipf_z100 "$SNAP_V3" env GRAFT_ALIGN_VOTE_BUDGET=1000000000000 $R graft.Bench q235_media_align
step q235_x100       target/sf1x100_doc "$SNAP_V3" $R graft.Bench q235_media_align

# --- q224: old-code same-data x100 row (snapshot v1 = pre-route code)
step q224_x100_oldcode target/sf1x100_doc /root/repo/target/probe_r16/classes_v1 $R graft.Bench q224_phash_near_dup

# --- q242 index probe: scaled embeddings tiers
step q242_z100    target/zipf_z100   "$SNAP_V3" $R graft.Bench q242_ann_index_topk
step q242_x100emb target/sf1x100_emb "$SNAP_V3" $R graft.Bench q242_ann_index_topk

# --- x1000 tails for the cheap linear ops
step q239_x1000 target/sf1x1000_doc "$SNAP_V3" $R graft.Bench q239_crossmodal_pairs
step q241_x1000 target/sf1x1000_doc "$SNAP_V3" $R graft.Bench q241_epoch_dedup_select

echo ALLDONE >> "$OUT"
