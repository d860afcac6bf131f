#!/bin/bash
# Round-14 close, verify-skill order: full sf0.01 sweep, full sf0.1
# sweep + self-enforcing artifact, bench, and the v2 mechanized
# variance adjudication (r13 verdict item 1: bench_recheck now stamps
# testdata_gen/git_sha, isolates the top-5 absolute movers, and
# adjudicates against the BASELINE COMMIT's code on TODAY's data when
# the generation rolled — BENCH_r13.json predates the stamps, so the
# baseline sha is passed explicitly: 7f687b4 is the r13 close commit
# whose working tree produced the r13 bench numbers). Run AFTER the
# last registry change; resume-aware via step markers.
cd /root/repo
mkdir -p target/probe_r14
L=target/probe_r14/close.log
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
export SNAP_CP=/root/repo/target/probe_r14/classes_close
export JAVA_EXTRA=-Xmx24g
export SPARK_GRAFT_CPUS=32
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

step sf001_dump $R graft.Verify /root/testdata/sf0.01 target/verify_r14_final
step sf001_check bash -c "python3 tools/check.py /root/testdata/sf0.01 target/verify_r14_final 2>/dev/null | tail -3"
step sf01_dump $R graft.Verify /root/testdata/sf0.1 target/verify_sf01_r14
NOTE="Second-scale-factor oracle sweep for round 14: full graft.Verify dump at sf0.1 (key-count guard green) hash-compared against DuckDB per tools/check.py, q61_graph_cc via the certificate checker (tools/cc_cert.py). Registry grew to 230 this round (q224 pHash near-dup pairs, q225 exact-signature cluster reduction, q226 scene segmentation, q227 tokenizer fertility, q228 RHO excess-loss selection); rows carry the driver's rows_match/schema_match/hash_match booleans; assembly self-enforcing against the live registry size."
step sf01_artifact python3 tools/sf01_artifact.py /root/testdata/sf0.1 target/verify_sf01_r14 14 "$NOTE"
step bench bash -c "SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench | grep '\"metric\"' > BENCH_r14_local.json; cat BENCH_r14_local.json"
step bench_recheck env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python3 tools/bench_recheck.py BENCH_r14_local.json BENCH_r13.json --baseline-sha 7f687b4
echo ALLDONE >> "$L"
