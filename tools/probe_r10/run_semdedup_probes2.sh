#!/bin/bash
cd /root/repo
run() {
  local label="$1"; local dir="$2"; shift 2
  local t0=$(date +%s)
  env "$@" tools/runj.sh graft.Verify "$dir" "target/probe_r10/$label" q167_semdedup > "target/probe_r10/$label.log" 2>&1
  local rc=$?
  echo "WALL $label $(( $(date +%s) - t0 )) s rc=$rc"
}
run sd_2l_p4_100x target/sf1x100_emb GRAFT_SEMDEDUP_K=800 GRAFT_SEMDEDUP_UPDATES=0 GRAFT_SEMDEDUP_SUPERK=28 GRAFT_SEMDEDUP_NPROBE=4
run sd_2l_p1_1000x target/sf1x1000_emb JAVA_EXTRA=-Xmx32g GRAFT_SEMDEDUP_K=8000 GRAFT_SEMDEDUP_UPDATES=0 GRAFT_SEMDEDUP_SUPERK=89 GRAFT_SEMDEDUP_NPROBE=1
echo done
