#!/bin/bash
# r12 colocated-shingle-layout probe: shingle-side partition pruning
# under layout "pb" vs the r11 honest negative (pd reads 100%).
# Compares the same 500-doc delta against 100x-corpus indexes at the
# raised 8192/512 fan-out: r11's surviving pd index vs a fresh pb
# twin. Resume-aware via marker lines.
cd /root/repo
OUT=target/probe_r12/colocate.log
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
step build_100x_raised_pb $R graft.tools.IndexProbe build target/sf1x100_doc target/probe_r12/idx100_raised_pb 8192 512 pb
step delta500_100x_raised_pd $R graft.tools.IndexProbe delta /root/testdata/sf0.01 target/probe_r11/idx100_raised
step delta500_100x_raised_pb $R graft.tools.IndexProbe delta /root/testdata/sf0.01 target/probe_r12/idx100_raised_pb
# default fan-out comparison too (256/64): pb twin of r11's default
step build_100x_default_pb $R graft.tools.IndexProbe build target/sf1x100_doc target/probe_r12/idx100_default_pb 256 64 pb
step delta500_100x_default_pd $R graft.tools.IndexProbe delta /root/testdata/sf0.01 target/probe_r11/idx100_default
step delta500_100x_default_pb $R graft.tools.IndexProbe delta /root/testdata/sf0.01 target/probe_r12/idx100_default_pb
echo ALLDONE >> "$OUT"
