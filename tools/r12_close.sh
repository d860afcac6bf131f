#!/bin/bash
# Round-12 close, in the verify-skill order: full sf0.01 sweep, full
# sf0.1 sweep + self-enforcing artifact (sf01_artifact.py now FAILS
# if the registry changed after the dump), bench. Run AFTER the last
# registry change; resume-aware via the step markers.
cd /root/repo
mkdir -p target/probe_r12
L=target/probe_r12/close.log
touch "$L"
step() {
  local label="$1"; shift
  grep -q "^DONE $label$" "$L" && return
  echo "=== $label ===" >> "$L"
  local t0=$(date +%s)
  "$@" >> "$L" 2>&1
  echo "WALL $label $(( $(date +%s) - t0 )) s" >> "$L"
  echo "DONE $label" >> "$L"
}
export SNAP_CP=/root/repo/target/probe_r12/classes_close
export JAVA_EXTRA=-Xmx24g
export SPARK_GRAFT_CPUS=32
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

step sf001_dump $R graft.Verify /root/testdata/sf0.01 target/verify_r12_final
step sf001_check bash -c "python3 tools/check.py /root/testdata/sf0.01 target/verify_r12_final 2>/dev/null | tail -3"
step sf01_dump $R graft.Verify /root/testdata/sf0.1 target/verify_sf01_r12
NOTE="Second-scale-factor oracle sweep for round 12: full graft.Verify dump at sf0.1 (key-count guard green) hash-compared against DuckDB per tools/check.py, q61_graph_cc via the certificate checker (tools/cc_cert.py). The artifact assembly is now SELF-ENFORCING: tools/sf01_artifact.py compares the dump against the live registry size (graft.tools.RegistrySize) and fails loudly on mismatch, closing the recurring stale-sweep gap (r9 q183-q185, r11 q196-q200)."
step sf01_artifact python3 tools/sf01_artifact.py /root/testdata/sf0.1 target/verify_sf01_r12 12 "$NOTE"
step bench bash -c "SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench | grep '\"metric\"' > BENCH_r12_local.json; cat BENCH_r12_local.json"
echo ALLDONE >> "$L"
