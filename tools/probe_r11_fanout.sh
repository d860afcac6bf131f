#!/bin/bash
# DedupIndex fan-out dial probe: per-delta probe cost + scan pruning
# metrics against 100x- and 1000x-aged indexes at default (256/64) vs
# raised (8192/512) fan-outs, with two delta sizes (50-doc sf0.001
# slice, 500-doc sf0.01 slice). Resume-aware via marker lines.
cd /root/repo
OUT=target/probe_r11/fanout.log
touch "$OUT"
step() { # label, cmd...
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
R=tools/runj_snap.sh
step build_100x_default $R graft.tools.IndexProbe build target/sf1x100_doc target/probe_r11/idx100_default 256 64
step build_100x_raised  $R graft.tools.IndexProbe build target/sf1x100_doc target/probe_r11/idx100_raised 8192 512
step delta50_100x_default  $R graft.tools.IndexProbe delta /root/testdata/sf0.001 target/probe_r11/idx100_default
step delta50_100x_raised   $R graft.tools.IndexProbe delta /root/testdata/sf0.001 target/probe_r11/idx100_raised
step delta500_100x_default $R graft.tools.IndexProbe delta /root/testdata/sf0.01 target/probe_r11/idx100_default
step delta500_100x_raised  $R graft.tools.IndexProbe delta /root/testdata/sf0.01 target/probe_r11/idx100_raised
step build_1000x_default $R graft.tools.IndexProbe build target/sf1x1000_doc target/probe_r11/idx1000_default 256 64
step build_1000x_raised  $R graft.tools.IndexProbe build target/sf1x1000_doc target/probe_r11/idx1000_raised 8192 512
step delta50_1000x_default  $R graft.tools.IndexProbe delta /root/testdata/sf0.001 target/probe_r11/idx1000_default
step delta50_1000x_raised   $R graft.tools.IndexProbe delta /root/testdata/sf0.001 target/probe_r11/idx1000_raised
step delta500_1000x_default $R graft.tools.IndexProbe delta /root/testdata/sf0.01 target/probe_r11/idx1000_default
step delta500_1000x_raised  $R graft.tools.IndexProbe delta /root/testdata/sf0.01 target/probe_r11/idx1000_raised
echo ALLDONE >> "$OUT"
