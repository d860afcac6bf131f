#!/bin/bash
# Generate the r10 scale-probe replica dirs (embeddings 100x/1000x,
# documents 1000x). Sequential; each is a Scale JVM.
cd /root/repo
set -e
tools/runj.sh graft.tools.Scale /root/testdata/sf0.1 target/sf1x100_emb 100 embeddings 2>&1 | grep scale
tools/runj.sh graft.tools.Scale /root/testdata/sf0.1 target/sf1x1000_emb 1000 embeddings 2>&1 | grep scale
tools/runj.sh graft.tools.Scale /root/testdata/sf0.1 target/sf1x1000_doc 1000 documents 2>&1 | grep scale
echo "[scalegen] done"
