#!/bin/bash
# r12 main probe batch (run AFTER probe_r12_colocate.sh finishes):
#  1. BM25 pruning dial at 100x docs (r11 measured 10x; the verdict
#     asks whether the stopword-postings win compounds with scale)
#  2. semDedup DEFAULT auto-routing end-to-end at k=2000 on the 2M
#     (1000x) embeddings corpus, keep-list diffed against an explicit
#     superK=45 run (routeSuperK(2000)=45, so identical is expected —
#     the probe exercises the default path at scale)
#  3. q196 winnowing + q197 segment dedup + q193 sealed trending at
#     10x/100x docs: wall (fresh-JVM bench median) + output rows
#  4. q197 adversarial: broadcast disabled (join-back must fall back
#     to a shuffle join) — correctness vs the sf0.01 oracle
# Resume-aware via marker lines.
cd /root/repo
OUT=target/probe_r12/main.log
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
export JAVA_EXTRA=-Xmx24g
export SNAP_CP=/root/repo/target/probe_r12/classes
R=tools/runj_snap.sh

# --- 1. BM25 dial at 100x ---
bm25() { # label, dir, extra env...
  local label="$1" dir="$2"; shift 2
  grep -q "^DONE bm25_$label$" "$OUT" && return
  echo "=== bm25_$label ===" >> "$OUT"
  env "$@" SPARK_GRAFT_SF_DIR="$dir" $R graft.Bench q177_bm25_topk 2>/dev/null \
    | grep '"metric"' >> "$OUT"
  echo "DONE bm25_$label" >> "$OUT"
}
bm25 exact_x100 target/sf1x100_doc
bm25 dial03_x100 target/sf1x100_doc GRAFT_BM25_MAXDF=0.3
bm25 dial01_x100 target/sf1x100_doc GRAFT_BM25_MAXDF=0.1

# --- 2. semDedup auto-route at k=2000 on 2M vectors ---
step sd_auto_k2000 env GRAFT_SEMDEDUP_K=2000 GRAFT_SEMDEDUP_UPDATES=0 \
  GRAFT_SEMDEDUP_SUPERK=-1 JAVA_EXTRA=-Xmx32g \
  $R graft.Verify target/sf1x1000_emb target/probe_r12/sd_auto q167_semdedup
step sd_explicit_k2000 env GRAFT_SEMDEDUP_K=2000 GRAFT_SEMDEDUP_UPDATES=0 \
  GRAFT_SEMDEDUP_SUPERK=45 JAVA_EXTRA=-Xmx32g \
  $R graft.Verify target/sf1x1000_emb target/probe_r12/sd_explicit q167_semdedup
step sd_diff python3 -c "
import duckdb
a = 'target/probe_r12/sd_auto/q167_semdedup/*.parquet'
b = 'target/probe_r12/sd_explicit/q167_semdedup/*.parquet'
na = duckdb.sql(f\"select count(*) from '{a}'\").fetchone()[0]
nb = duckdb.sql(f\"select count(*) from '{b}'\").fetchone()[0]
d1 = duckdb.sql(f\"select count(*) from (select * from '{a}' except select * from '{b}')\").fetchone()[0]
d2 = duckdb.sql(f\"select count(*) from (select * from '{b}' except select * from '{a}')\").fetchone()[0]
ka = duckdb.sql(f\"select count(*) from '{a}' where kept=1\").fetchone()[0]
kb = duckdb.sql(f\"select count(*) from '{b}' where kept=1\").fetchone()[0]
print(f'rows auto={na} explicit={nb} except_ab={d1} except_ba={d2} kept_auto={ka} kept_explicit={kb}')
"

# --- 3. decade probes: q196/q197/q193 at 10x and 100x ---
for q in q196_winnowing_pairs q197_segment_dedup q193_stream_trending_terms; do
  for sc in 10 100; do
    step bench_${q}_x${sc} env SPARK_GRAFT_SF_DIR=target/sf1x${sc}_doc \
      $R graft.Bench $q
  done
done
rowdump() { # label q dir
  local label="$1" q="$2" dir="$3"
  grep -q "^DONE rows_$label$" "$OUT" && return
  echo "=== rows_$label ===" >> "$OUT"
  env SPARK_GRAFT_SF_DIR="$dir" $R graft.Verify "$dir" "target/probe_r12/rows_$label" "$q" >/dev/null 2>&1
  python3 -c "
import duckdb
print('$label rows =', duckdb.sql(\"select count(*) from 'target/probe_r12/rows_$label/$q/*.parquet'\").fetchone()[0])" >> "$OUT" 2>&1
  echo "DONE rows_$label" >> "$OUT"
}
rowdump q196_x10 q196_winnowing_pairs target/sf1x10_doc
rowdump q196_x100 q196_winnowing_pairs target/sf1x100_doc
rowdump q197_x10 q197_segment_dedup target/sf1x10_doc
rowdump q197_x100 q197_segment_dedup target/sf1x100_doc

# --- 4. q197 no-broadcast adversarial (shuffle-join fallback) ---
step q197_nobcast env JAVA_EXTRA="-Xmx24g -Dspark.sql.autoBroadcastJoinThreshold=-1 -Dspark.sql.adaptive.autoBroadcastJoinThreshold=-1" \
  $R graft.Verify /root/testdata/sf0.01 target/probe_r12/q197_nobcast q197_segment_dedup
step q197_nobcast_check python3 tools/check.py /root/testdata/sf0.01 target/probe_r12/q197_nobcast q197_segment_dedup
step q197_nobcast_plan env JAVA_EXTRA="-Xmx24g -Dspark.sql.autoBroadcastJoinThreshold=-1 -Dspark.sql.adaptive.autoBroadcastJoinThreshold=-1" \
  SPARK_GRAFT_RUN=true SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  bash -c "$R graft.tools.Explain q197_segment_dedup | grep -cE 'SortMergeJoin|ShuffledHashJoin'"
echo ALLDONE >> "$OUT"
