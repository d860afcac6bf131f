#!/bin/bash
# Round-15 close, verify-skill order: full sf0.01 sweep, full sf0.1
# sweep + self-enforcing artifact, bench, v3 variance adjudication
# (now also adjudicating the DRIVER artifact's rows — the r14 verdict
# "what's wrong" 1: BENCH_r14.json carried 3x-over-local numbers for
# q212/q213/q219 that the local record contradicted; --driver
# classifies each such row contention vs anomalous-local in a fresh
# JVM), and the MECHANIZED LoC diagnostic (r14 verdict item 7: the
# old `xargs wc -l | tail -1` silently reports only the last xargs
# batch — 225k where the true reference-core count is 389k; the
# robust form pipes every file through ONE cat into wc). Run AFTER
# the last registry change; resume-aware via step markers.
cd /root/repo
mkdir -p target/probe_r15
L=target/probe_r15/close2.log
touch "$L"
step() {
  local label="$1"; shift
  grep -q "^DONE $label$" "$L" && return
  echo "=== $label ===" >> "$L"
  local t0=$(date +%s)
  "$@" >> "$L" 2>&1
  local rc=$?
  local t1=$(date +%s)
  echo "WALL $label $(( t1 - t0 )) s rc=$rc" >> "$L"
  [ $rc -eq 0 ] && echo "DONE $label" >> "$L"
}
export SNAP_CP=/root/repo/target/probe_r15/classes_close
export JAVA_EXTRA=-Xmx24g
export SPARK_GRAFT_CPUS=32
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

# LoC diagnostic, the honest method (one cat, one wc — no xargs
# batching): repo src/main vs the reference's core modules. The
# comparable figure filters the reference to */src/main/* (the r14
# judge's 388,846); the unfiltered loc step (672,359) also counted
# the reference's test sources.
step loc bash -c '
  echo "repo src/main (cat|wc -l):";
  find src/main -name "*.scala" -print0 | sort -z | xargs -0 cat | wc -l;
  echo "reference core (flink-core,-java,-scala,-streaming-java,-streaming-scala,-table,-libraries,-optimizer; cat|wc -l):";
  find /root/reference/flink-core /root/reference/flink-java \
       /root/reference/flink-scala /root/reference/flink-streaming-java \
       /root/reference/flink-streaming-scala /root/reference/flink-table \
       /root/reference/flink-libraries /root/reference/flink-optimizer \
       -name "*.java" -o -name "*.scala" 2>/dev/null | sort | tr "\n" "\0" | xargs -0 cat | wc -l'
step loc_main bash -c '
  echo "reference core src/main only (the judge-comparable figure):";
  find /root/reference/flink-core /root/reference/flink-java \
       /root/reference/flink-scala /root/reference/flink-streaming-java \
       /root/reference/flink-streaming-scala /root/reference/flink-table \
       /root/reference/flink-libraries /root/reference/flink-optimizer \
       \( -name "*.java" -o -name "*.scala" \) -path "*/src/main/*" \
       2>/dev/null | sort | tr "\n" "\0" | xargs -0 cat | wc -l'

step sf001_dump $R graft.Verify /root/testdata/sf0.01 target/verify_r15_final
step sf001_check bash -c "python3 tools/check.py /root/testdata/sf0.01 target/verify_r15_final 2>/dev/null | tail -3"
step sf01_dump $R graft.Verify /root/testdata/sf0.1 target/verify_sf01_r15
NOTE="Second-scale-factor oracle sweep for round 15: full graft.Verify dump at sf0.1 (key-count guard green) hash-compared against DuckDB per tools/check.py, q61_graph_cc via the certificate checker (tools/cc_cert.py). Registry grew to 239 this round (q229 at-ingest perceptual-hash dedup, q230 audio segmentation, q231 video near-dup, q232 media QA report, q233 streaming media QA, q234 scene-sequence video dedup, q235 landmark alignment, q236 vocab coverage curve, q237 embedding drift PSI); rows carry the driver's rows_match/schema_match/hash_match booleans; assembly self-enforcing against the live registry size."
step sf01_artifact python3 tools/sf01_artifact.py /root/testdata/sf0.1 target/verify_sf01_r15 15 "$NOTE"
step bench bash -c "SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench | grep '\"metric\"' > BENCH_r15_local.json; cat BENCH_r15_local.json"
step bench_recheck env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python3 tools/bench_recheck.py BENCH_r15_local.json BENCH_r14_local.json --driver BENCH_r14.json
echo ALLDONE >> "$L"
