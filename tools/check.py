#!/usr/bin/env python3
"""Dev-side emulation of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads each <outDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB against <sfDir>'s
tables, and compares: column names (sorted), row counts, and values
(rows sorted, exact equality; floats compared to 1e-9 rel tol as a
fallback diagnostic so we can see *how* far off a mismatch is).
"""
import sys, json, glob, math
import duckdb
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    return ("o", str(v))


def sort_key(row):
    return [(t, str(x)) for (t, x) in row]


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            gcols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            ecols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(ecols)}")
            n_fail += 1
            continue
        # reorder columns by sorted name like the driver does
        gidx = [gcols.index(c) for c in sorted(gcols)]
        eidx = [ecols.index(c) for c in sorted(ecols)]
        g = sorted(([norm_cell(r[i]) for i in gidx] for r in got), key=sort_key)
        e = sorted(([norm_cell(r[i]) for i in eidx] for r in exp), key=sort_key)
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        bad = None
        for i, (rg, re_) in enumerate(zip(g, e)):
            for (tg, vg), (te, ve) in zip(rg, re_):
                ok = False
                if tg == te == "f":
                    ok = (vg == ve) or (
                        math.isfinite(vg) and math.isfinite(ve)
                        and abs(vg - ve) <= 1e-9 * max(1, abs(vg), abs(ve)))
                    if vg != ve and ok:
                        ok = "close"
                else:
                    ok = (tg, vg) == (te, ve)
                if not ok:
                    bad = (i, rg, re_)
                    break
                if ok == "close":
                    bad = bad or ("CLOSE", rg, re_)
            if bad and bad[0] != "CLOSE":
                break
        if bad is None:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        elif bad[0] == "CLOSE":
            print(f"WARN {name}: float-close-not-exact e.g. {bad[1]} vs {bad[2]}")
            n_fail += 1
        else:
            print(f"FAIL {name}: row {bad[0]}\n  spark : {bad[1]}\n  oracle: {bad[2]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
