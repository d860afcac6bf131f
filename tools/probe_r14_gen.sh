#!/bin/bash
# r14: regenerate the probe corpora (target/ was cleaned between
# sessions). Replica dirs via tools/Scale (documents-only — the r10
# recipe), Zipf dirs via tools/ZipfGen at the r13 parameters but the
# r14 paths. Resume-aware: skips dirs whose _SUCCESS-bearing parquet
# already exists.
cd /root/repo
mkdir -p target/probe_r14
OUT=target/probe_r14/gen.log
touch "$OUT"
step() {
  local label="$1" dir="$2"; shift 2
  [ -e "$dir/documents.parquet/_SUCCESS" ] && { echo "SKIP $label" >> "$OUT"; return; }
  echo "=== $label ===" >> "$OUT"
  local t0=$(date +%s)
  "$@" >> "$OUT" 2>&1
  echo "WALL $label $(( $(date +%s) - t0 )) s rc=$?" >> "$OUT"
}
export JAVA_EXTRA=-Xmx24g
R=tools/runj.sh
step x100_doc  target/sf1x100_doc  $R graft.tools.Scale /root/testdata/sf0.1 target/sf1x100_doc 100 documents
step x1000_doc target/sf1x1000_doc $R graft.tools.Scale /root/testdata/sf0.1 target/sf1x1000_doc 1000 documents
step z10  target/zipf_z10  $R graft.tools.ZipfGen target/zipf_z10  50000  200000 64 13
step z100 target/zipf_z100 $R graft.tools.ZipfGen target/zipf_z100 500000 200000 64 13
echo ALLDONE >> "$OUT"
