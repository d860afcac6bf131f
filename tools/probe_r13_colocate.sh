#!/bin/bash
# r13 verdict item 6: the pb shingleGroups file-compaction dial.
# r12's finding: pb's 2.4%-partition-read pruning win was real but the
# sandbox WALL was worse than pd because <=4x-replicated KB files paid
# per-file open costs. Compare, against the surviving r11/r12 100x
# indexes (8192/512 raised fan-out), a grouped-pb twin at
# shingleGroups=512: same pruning CONTRACT (scan ∝ delta footprint in
# groups), 16x fewer/bigger shingle files. Also the default-fan-out
# trio. Same 500-doc delta probe as r12. Resume-aware.
cd /root/repo
OUT=target/probe_r13/colocate.log
touch "$OUT"
step() {
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
export SNAP_CP=/root/repo/target/probe_r13/classes_v2
[ -d "$SNAP_CP" ] || cp -r target/scala-2.13/classes "$SNAP_CP"
R=tools/runj_snap.sh
# grouped-pb twin of the raised-fan-out index (8192 band buckets,
# shingle dirs compacted 8192 -> 512)
step build_100x_raised_pbg $R graft.tools.IndexProbe build target/sf1x100_doc target/probe_r13/idx100_raised_pbg 8192 512 pb 512
# delta probes: pd (r11 survivor), ungrouped pb (r12 survivor), grouped pb
step delta500_raised_pd  $R graft.tools.IndexProbe delta /root/testdata/sf0.01 target/probe_r11/idx100_raised
step delta500_raised_pb  $R graft.tools.IndexProbe delta /root/testdata/sf0.01 target/probe_r12/idx100_raised_pb
step delta500_raised_pbg $R graft.tools.IndexProbe delta /root/testdata/sf0.01 target/probe_r13/idx100_raised_pbg
# file-count evidence
step files_raised bash -c 'for d in target/probe_r12/idx100_raised_pb/shingles target/probe_r13/idx100_raised_pbg/shingles; do echo "$d dirs=$(ls -d $d/pb=* 2>/dev/null | wc -l) files=$(find $d -name "*.parquet" | wc -l) bytes=$(du -sb $d | cut -f1)"; done'
echo ALLDONE >> "$OUT"
