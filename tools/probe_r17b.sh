#!/bin/bash
# r17b: decade rows for the four new lifecycle operators (q249-q252).
cd /root/repo
mkdir -p target/probe_r17
OUT=target/probe_r17/probe_b.log
touch "$OUT"
export JAVA_EXTRA=${JAVA_EXTRA:--Xmx24g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
SNAP=/root/repo/target/probe_r17/classes_v2
[ -d "$SNAP" ] || cp -r target/scala-2.13/classes "$SNAP"
step() {
  local label="$1" sfdir="$2"; shift 2
  grep -q "^DONE $label$" "$OUT" && { echo "SKIP $label" ; return; }
  echo "=== $label ===" >> "$OUT"
  local t0=$(date +%s)
  SNAP_CP="$SNAP" SPARK_GRAFT_SF_DIR="$sfdir" "$@" >> "$OUT" 2>&1
  local rc=$?
  local t1=$(date +%s)
  echo "WALL $label $(( t1 - t0 )) s rc=$rc" >> "$OUT"
  [ $rc -eq 0 ] && echo "DONE $label" >> "$OUT"
}
R=tools/runj_snap.sh
step q249_z100    target/zipf_z100   $R graft.Bench q249_ann_index_asof
step q249_x100emb target/sf1x100_emb $R graft.Bench q249_ann_index_asof
step q250_z100    target/zipf_z100   $R graft.Bench q250_ann_index_compact
step q250_x100emb target/sf1x100_emb $R graft.Bench q250_ann_index_compact
step q251_z100    target/zipf_z100   $R graft.Bench q251_stream_xmodal_retrieval
step q251_x100mm  target/sf1x100_mm  $R graft.Bench q251_stream_xmodal_retrieval
step q252_z100    target/zipf_z100   $R graft.Bench q252_ann_index_merge
step q252_x100emb target/sf1x100_emb $R graft.Bench q252_ann_index_merge
echo ALLDONE >> "$OUT"
