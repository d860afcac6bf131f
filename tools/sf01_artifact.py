#!/usr/bin/env python3
"""Assemble CORRECTNESS_sf01_r{N}.json: run tools/check.py over the
sf0.1 Verify dump for every query EXCEPT q61 (whose recursive-CTE
closure oracle is infeasible in DuckDB at this sf), verify q61 via
the sound-and-complete certificate checker (tools/cc_cert.py), and
emit the per-query JSON artifact in the r09/r10 format.

Usage: sf01_artifact.py <sfDir> <outDir> <round> <note>
"""
import json, re, subprocess, sys

sfdir, outdir, rnd, note = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(n for n in oracle if n != "q61_graph_cc")

res = subprocess.run(
    [sys.executable, "tools/check.py", sfdir, outdir] + names,
    capture_output=True, text=True)
print(res.stdout[-2000:])
art = {}
npass = nfail = 0
for line in res.stdout.splitlines():
    m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
    if m:
        art[m.group(1)] = {"pass": True, "rows": int(m.group(2))}
        npass += 1
    elif line.startswith("FAIL"):
        qn = line.split()[1].rstrip(":")
        art[qn] = {"pass": False, "detail": line[:300]}
        nfail += 1

cc = subprocess.run(
    [sys.executable, "tools/cc_cert.py", sfdir, outdir],
    capture_output=True, text=True)
print(cc.stdout.strip())
m = re.search(r"PASS q61_graph_cc \(certificate, (\d+) rows\)", cc.stdout)
if m:
    art["q61_graph_cc"] = {"pass": True, "rows": int(m.group(1)),
                           "method": "cc_cert certificate"}
    npass += 1
else:
    art["q61_graph_cc"] = {"pass": False, "detail": cc.stdout[:300]}
    nfail += 1

out = {"_meta": {"sf": "0.1", "round": rnd, "note": note,
                 "pass": npass, "fail": nfail}}
out.update(dict(sorted(art.items())))
path = f"CORRECTNESS_sf01_r{rnd:02d}.json"
json.dump(out, open(path, "w"), indent=1)
print(f"wrote {path}: {npass} pass, {nfail} fail")
