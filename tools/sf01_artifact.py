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

# SELF-ENFORCING SWEEP GUARD (r12, verdict item 1): the dump's own
# key-count guard catches a SHRUNKEN registry, but a registry grown
# AFTER the sweep shipped stale artifacts three rounds running
# (r9 q183-q185, r11 q196-q200). Compare the dump being assembled
# against the registry size of the CURRENT code — mismatch means the
# sweep predates a registry change: RE-RUN it, don't ship.
rs = subprocess.run(["tools/runj.sh", "graft.tools.RegistrySize"],
                    capture_output=True, text=True)
m = re.search(r"registry_size=(\d+)", rs.stdout)
if not m:
    sys.exit(f"GUARD ERROR: could not read registry size "
             f"(stdout={rs.stdout[-200:]!r} stderr={rs.stderr[-200:]!r})")
registry_size = int(m.group(1))
if len(oracle) != registry_size:
    sys.exit(f"STALE SWEEP: dump at {outdir} covers {len(oracle)} queries "
             f"but the current registry has {registry_size} — the registry "
             f"changed after this sweep ran. Re-run graft.Verify on the "
             f"current classes and re-assemble.")

res = subprocess.run(
    [sys.executable, "tools/check.py", sfdir, outdir] + names,
    capture_output=True, text=True)
print(res.stdout[-2000:])
art = {}
npass = nfail = 0


def row(passed, rows_match, schema_match, hash_match, **extra):
    """Driver-schema artifact row (r12 verdict item 7): the three
    booleans the driver's CORRECTNESS_r{N}.json carries, so naive
    checkers that read rows_match/schema_match/hash_match see the
    true verdict instead of treating every entry as failed. `pass` is
    kept for continuity with the r09-r12 artifacts."""
    return {"pass": passed, "rows_match": rows_match,
            "schema_match": schema_match, "hash_match": hash_match, **extra}


for line in res.stdout.splitlines():
    m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
    if m:
        art[m.group(1)] = row(True, True, True, True, rows=int(m.group(2)))
        npass += 1
    elif line.startswith("FAIL"):
        qn = line.split()[1].rstrip(":")
        detail = line[:300]
        # map check.py's failure mode onto the driver booleans
        if ": cols " in line:
            art[qn] = row(False, False, False, False, detail=detail)
        elif ": rows " in line:
            art[qn] = row(False, False, True, False, detail=detail)
        elif ": row " in line:
            art[qn] = row(False, True, True, False, detail=detail)
        else:  # no output / exec error
            art[qn] = row(False, False, False, False, detail=detail)
        nfail += 1

cc = subprocess.run(
    [sys.executable, "tools/cc_cert.py", sfdir, outdir],
    capture_output=True, text=True)
print(cc.stdout.strip())
m = re.search(r"PASS q61_graph_cc \(certificate, (\d+) rows\)", cc.stdout)
if m:
    art["q61_graph_cc"] = row(True, True, True, True, rows=int(m.group(1)),
                              method="cc_cert certificate")
    npass += 1
else:
    art["q61_graph_cc"] = row(False, False, False, False,
                              detail=cc.stdout[:300])
    nfail += 1

if npass + nfail != registry_size:
    sys.exit(f"INCOMPLETE ARTIFACT: {npass + nfail} rows assembled but the "
             f"registry has {registry_size} queries — a query produced "
             f"neither PASS nor FAIL (crashed dump or check).")
out = {"_meta": {"sf": "0.1", "round": rnd, "note": note,
                 "pass": npass, "fail": nfail,
                 "registry_size_at_assembly": registry_size}}
out.update(dict(sorted(art.items())))
path = f"CORRECTNESS_sf01_r{rnd:02d}.json"
json.dump(out, open(path, "w"), indent=1)
print(f"wrote {path}: {npass} pass, {nfail} fail")
