#!/bin/bash
cd /root/repo
run() { # label, extra env...
  local label="$1"; shift
  local t0=$(date +%s.%N)
  env "$@" tools/runj.sh graft.Verify "$DIR" "target/probe_r10/$label" q167_semdedup > "target/probe_r10/$label.log" 2>&1
  local rc=$?
  local t1=$(date +%s.%N)
  echo "WALL $label $(echo "$t1 - $t0" | bc) s rc=$rc"
}
DIR=target/sf1x100_emb
run sd_flat_100x  GRAFT_SEMDEDUP_K=800 GRAFT_SEMDEDUP_UPDATES=0
run sd_2l_p1_100x GRAFT_SEMDEDUP_K=800 GRAFT_SEMDEDUP_UPDATES=0 GRAFT_SEMDEDUP_SUPERK=28 GRAFT_SEMDEDUP_NPROBE=1
run sd_2l_p2_100x GRAFT_SEMDEDUP_K=800 GRAFT_SEMDEDUP_UPDATES=0 GRAFT_SEMDEDUP_SUPERK=28 GRAFT_SEMDEDUP_NPROBE=2
echo done
