#!/bin/bash
# r14 verdict item 2: the gate family re-probed in the ORGANIC-
# ADMISSION regime. Both prior scale corpora were degenerate for
# Gopher admission (replicas 0.35% — suffixing breaks stopword
# matches; plain Zipf 0% — no stopwords at all), so the r13 preGate
# win and gate-agreement numbers came from adversarially-favorable
# regimes. ZipfGen's hetero=1 draw targets 30-50% admission (measured
# 40.3% at 5k docs) with every Gopher rule non-degenerate. Rows here:
# admission per corpus, q211 ungated-vs-preGate walls (CanonProbe,
# fresh JVM each), q213/q219 teacher agreement + sampleFrac fitness
# (GateProbe), and the q221 composed build (graft.Bench). Resume-aware.
cd /root/repo
OUT=target/probe_r14/gate.log
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
export SNAP_CP=/root/repo/target/probe_r14/classes_v3
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

step gen_h10  $R graft.tools.ZipfGen target/zipf_h10 50000 50000 64 13 1
step gen_h100 $R graft.tools.ZipfGen target/zipf_h100 500000 50000 64 13 1

step admission python3 - <<'EOF'
import duckdb
stop = "('the','be','to','of','and','that','have','with')"
for d in ['target/zipf_h10', 'target/zipf_h100']:
    q = f"""
WITH d AS (SELECT *, string_split(text, ' ') AS w,
  string_split(lower(text), ' ') AS wl FROM '{d}/documents.parquet/*.parquet'),
g AS (SELECT len(w) BETWEEN 30 AND 100000 AS c_len,
  (length(replace(text,' ',''))::DOUBLE/len(w)) BETWEEN 3.0 AND 5.0 AS c_mwl,
  len(list_filter(list_distinct(wl), x -> x IN {stop})) >= 1 AS c_stop,
  (1.0 - len(list_distinct(wl))::DOUBLE/len(w)) <= 0.6 AS c_dup,
  1.0/(1.0+exp(-(0.2*(length(replace(text,' ',''))::DOUBLE/len(w))
    + 2.0*(len(list_filter(w, x -> x IN ('the','a','of','and','to')))::DOUBLE/len(w))
    - 1.0))) >= 0.5 AS teach FROM d)
SELECT avg((c_len AND c_mwl AND c_stop AND c_dup)::INT) admit,
       avg(teach::INT) teacher FROM g"""
    print(d, duckdb.sql(q).fetchall())
EOF

# q211: ungated vs preGate walls in the organic regime, fresh JVM each
step q211_ungated_h10  $R graft.tools.CanonProbe target/zipf_h10  ungated
step q211_pregate_h10  $R graft.tools.CanonProbe target/zipf_h10  pregate
step q211_ungated_h100 $R graft.tools.CanonProbe target/zipf_h100 ungated
step q211_pregate_h100 $R graft.tools.CanonProbe target/zipf_h100 pregate

# q213/q219: teacher agreement + sampleFrac fitness in the organic regime
step gate_h10  $R graft.tools.GateProbe target/zipf_h10 0.1
step gate_h100 $R graft.tools.GateProbe target/zipf_h100 0.1

# q221: the composed build end-to-end
step q221_h10  env SPARK_GRAFT_SF_DIR=target/zipf_h10  $R graft.Bench q221_curation_build
step q221_h100 env SPARK_GRAFT_SF_DIR=target/zipf_h100 $R graft.Bench q221_curation_build
echo ALLDONE >> "$OUT"
