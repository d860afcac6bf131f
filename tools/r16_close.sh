#!/bin/bash
# Round-16 close, verify-skill order: full sf0.01 sweep, full sf0.1
# sweep + self-enforcing artifact, bench (now stamping run_context —
# loadavg + other-JVM counts at start/end), recheck v4.2 (symmetric
# median-of-3 escalation; driver rows adjudicate contention_by_context
# from the run_context stamps when available, fresh-JVM isolation
# otherwise), and the mechanized LoC diagnostic. Run AFTER the last
# registry change; resume-aware via step markers.
cd /root/repo
mkdir -p target/probe_r16
L=target/probe_r16/close2.log
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
export SNAP_CP=/root/repo/target/probe_r16/classes_close
export JAVA_EXTRA=-Xmx24g
export SPARK_GRAFT_CPUS=32
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh

step loc bash -c '
  echo "repo src/main (cat|wc -l):";
  find src/main -name "*.scala" -print0 | sort -z | xargs -0 cat | wc -l;
  echo "reference core src/main only (the judge-comparable figure):";
  find /root/reference/flink-core /root/reference/flink-java \
       /root/reference/flink-scala /root/reference/flink-streaming-java \
       /root/reference/flink-streaming-scala /root/reference/flink-table \
       /root/reference/flink-libraries /root/reference/flink-optimizer \
       \( -name "*.java" -o -name "*.scala" \) -path "*/src/main/*" \
       2>/dev/null | sort | tr "\n" "\0" | xargs -0 cat | wc -l'

step sf001_dump $R graft.Verify /root/testdata/sf0.01 target/verify_r16_final2
step sf001_check bash -c "python3 tools/check.py /root/testdata/sf0.01 target/verify_r16_final2 2>/dev/null | tail -3"
step sf01_dump $R graft.Verify /root/testdata/sf0.1 target/verify_sf01_r16
NOTE="Second-scale-factor oracle sweep for round 16: full graft.Verify dump at sf0.1 (key-count guard green) hash-compared against DuckDB per tools/check.py, q61_graph_cc via the certificate checker (tools/cc_cert.py). Registry grew to 248 this round (q238 streaming ANN index ingest, q239 cross-modal pair consistency, q240 contamination attribution, q241 epoch-aware dedup-at-selection, q242 partition-pruned ANN index probe, q243 streaming contamination attribution, q244 ANN index health report, q245 cross-modal dedup keep-list, q246 streaming cell-arrival drift); rows carry the driver's rows_match/schema_match/hash_match booleans; assembly self-enforcing against the live registry size."
step sf01_artifact python3 tools/sf01_artifact.py /root/testdata/sf0.1 target/verify_sf01_r16 16 "$NOTE"
step bench bash -c "SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench | grep '\"metric\"' > BENCH_r16_local.json; cat BENCH_r16_local.json"
step bench_recheck env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python3 tools/bench_recheck.py BENCH_r16_local.json BENCH_r15_local.json --driver BENCH_r15.json
echo ALLDONE >> "$L"
