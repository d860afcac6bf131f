#!/bin/bash
# Round-13 close, verify-skill order: full sf0.01 sweep, full sf0.1
# sweep + self-enforcing artifact (driver-schema rows as of r13),
# bench, and the NEW mechanized variance adjudication (verdict item 5:
# bench_recheck.py auto-re-runs >25% common-set upticks in a fresh JVM
# and records both numbers in BENCH_r13_local.json). Run AFTER the
# last registry change; resume-aware via step markers.
cd /root/repo
mkdir -p target/probe_r13
L=target/probe_r13/close.log
touch "$L"
step() {
  local label="$1"; shift
  grep -q "^DONE $label$" "$L" && return
  echo "=== $label ===" >> "$L"
  local t0=$(date +%s)
  "$@" >> "$L" 2>&1
  local rc=$?
  echo "WALL $label $(( $(date +%s) - t0 )) s rc=$rc" >> "$L"
  [ $rc -eq 0 ] && echo "DONE $label" >> "$L"
}
export SNAP_CP=/root/repo/target/probe_r13/classes_close
export JAVA_EXTRA=-Xmx24g
export SPARK_GRAFT_CPUS=32
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

step sf001_dump $R graft.Verify /root/testdata/sf0.01 target/verify_r13_final
step sf001_check bash -c "python3 tools/check.py /root/testdata/sf0.01 target/verify_r13_final 2>/dev/null | tail -3"
step sf01_dump $R graft.Verify /root/testdata/sf0.1 target/verify_sf01_r13
NOTE="Second-scale-factor oracle sweep for round 13: full graft.Verify dump at sf0.1 (key-count guard green) hash-compared against DuckDB per tools/check.py, q61_graph_cc via the certificate checker (tools/cc_cert.py). Artifact rows now carry the driver's rows_match/schema_match/hash_match booleans (r12 verdict item 7) alongside the r09-r12 pass/rows fields; assembly remains self-enforcing against the live registry size."
step sf01_artifact python3 tools/sf01_artifact.py /root/testdata/sf0.1 target/verify_sf01_r13 13 "$NOTE"
step bench bash -c "SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench | grep '\"metric\"' > BENCH_r13_local.json; cat BENCH_r13_local.json"
step bench_recheck env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python3 tools/bench_recheck.py BENCH_r13_local.json BENCH_r12.json
echo ALLDONE >> "$L"
