#!/bin/bash
# waits for probe_r14_new.sh to finish, then runs the fused re-probe
until grep -q ALLDONE /root/repo/target/probe_r14/new.log 2>/dev/null; do
  sleep 30
done
bash /root/repo/tools/probe_r14_fused.sh
