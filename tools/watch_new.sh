#!/bin/bash
# waits for the gate probe to finish, then runs the new-operator probes
until grep -q ALLDONE /root/repo/target/probe_r14/gate.log 2>/dev/null; do
  sleep 30
done
bash /root/repo/tools/probe_r14_new.sh
