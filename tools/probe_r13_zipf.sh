#!/bin/bash
# r13 verdict item 1: Zipf-realistic corpora (tools/ZipfGen — seeded
# Zipf word draws, clustered embeddings) re-measure the skew-sensitive
# probes in a regime where they CAN fire: the BM25 maxDfFrac dial
# (replica suffixing froze hot-term df fractions, so it pruned ZERO
# postings at every scale), q206's worst decade row, and the
# exact-vs-two-level ANN agreement (replica embeddings were identical
# twins — agreement measured tie-breaking, not routing). Resume-aware.
cd /root/repo
OUT=target/probe_r13/zipf.log
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
export SNAP_CP=/root/repo/target/probe_r13/classes
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh
# decades of a 5k-doc base (the sf0.1 documents cardinality)
step gen_z1   $R graft.tools.ZipfGen target/zipf/z1   5000   200000 64 13
step gen_z10  $R graft.tools.ZipfGen target/zipf/z10  50000  200000 64 13
step gen_z100 $R graft.tools.ZipfGen target/zipf/z100 500000 200000 64 13
# BM25 dial curve + deterministic work metric (contribution rows)
step bm25_z1   $R graft.tools.Bm25Probe target/zipf/z1 3
step bm25_z10  $R graft.tools.Bm25Probe target/zipf/z10 3
step bm25_z100 $R graft.tools.Bm25Probe target/zipf/z100 3
# q206 decade rows on the Zipf regime (fresh JVM per row, noop sink)
step q206_z1   env SPARK_GRAFT_SF_DIR=target/zipf/z1   $R graft.Bench q206_source_minhash_sim
step q206_z10  env SPARK_GRAFT_SF_DIR=target/zipf/z10  $R graft.Bench q206_source_minhash_sim
step q206_z100 env SPARK_GRAFT_SF_DIR=target/zipf/z100 $R graft.Bench q206_source_minhash_sim
# ANN agreement on CLUSTERED embeddings (z10 = 50k vecs, 64 true
# clusters): the r10 100x-row config (k=800 assign-only, superK=28)
step ann_flat env GRAFT_SEMDEDUP_K=800 GRAFT_SEMDEDUP_UPDATES=0 GRAFT_SEMDEDUP_SUPERK=0 \
  $R graft.Verify target/zipf/z10 target/probe_r13/ann_flat q167_semdedup
step ann_np1 env GRAFT_SEMDEDUP_K=800 GRAFT_SEMDEDUP_UPDATES=0 GRAFT_SEMDEDUP_SUPERK=28 GRAFT_SEMDEDUP_NPROBE=1 \
  $R graft.Verify target/zipf/z10 target/probe_r13/ann_np1 q167_semdedup
step ann_np2 env GRAFT_SEMDEDUP_K=800 GRAFT_SEMDEDUP_UPDATES=0 GRAFT_SEMDEDUP_SUPERK=28 GRAFT_SEMDEDUP_NPROBE=2 \
  $R graft.Verify target/zipf/z10 target/probe_r13/ann_np2 q167_semdedup
step ann_np4 env GRAFT_SEMDEDUP_K=800 GRAFT_SEMDEDUP_UPDATES=0 GRAFT_SEMDEDUP_SUPERK=28 GRAFT_SEMDEDUP_NPROBE=4 \
  $R graft.Verify target/zipf/z10 target/probe_r13/ann_np4 q167_semdedup
echo ALLDONE >> "$OUT"
