#!/bin/bash
# r14 decade probes (verdict items 3 + 4): q224 pHash near-dup decade
# rows in BOTH regimes (replica-suffix = adversarial, Zipf = realistic)
# and the q205 exact-vs-routed overlap walls at 100x/1000x. Fresh JVM
# per row via graft.Bench <q> (noop sink, median-of-3 after warm-up),
# off a snapshot classpath so sbt can keep compiling. Resume-aware.
cd /root/repo
OUT=target/probe_r14/decade.log
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
export SNAP_CP=/root/repo/target/probe_r14/classes
R=tools/runj_snap.sh

# ---- q224 decades: replica regime ----
step q224_sf01  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench q224_phash_near_dup
step q224_x100  env SPARK_GRAFT_SF_DIR=target/sf1x100_doc  $R graft.Bench q224_phash_near_dup
step q224_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q224_phash_near_dup
# ---- q224 decades: Zipf regime ----
step q224_z10   env SPARK_GRAFT_SF_DIR=target/zipf_z10  $R graft.Bench q224_phash_near_dup
step q224_z100  env SPARK_GRAFT_SF_DIR=target/zipf_z100 $R graft.Bench q224_phash_near_dup

# ---- q205 exact vs routed (verdict item 3) ----
step q205_exact_x100 env SPARK_GRAFT_SF_DIR=target/sf1x100_doc GRAFT_OVERLAP_ROUTE_CHARS=999999999999 $R graft.Bench q205_source_overlap
step q205_routed_x100 env SPARK_GRAFT_SF_DIR=target/sf1x100_doc GRAFT_OVERLAP_ROUTE_CHARS=0 $R graft.Bench q205_source_overlap
step q205_routed_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc $R graft.Bench q205_source_overlap
step q205_exact_x1000 env SPARK_GRAFT_SF_DIR=target/sf1x1000_doc GRAFT_OVERLAP_ROUTE_CHARS=999999999999 $R graft.Bench q205_source_overlap
echo ALLDONE >> "$OUT"
