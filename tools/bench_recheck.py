#!/usr/bin/env python3
"""Mechanized in-suite bench variance adjudication (r12 verdict item 5).

Three rounds running, common-set upticks in the in-suite bench
(q54 0.71->1.79 etc.) were adjudicated BY HAND with fresh-JVM isolated
re-runs that cleared them. This tool does that adjudication in the
close itself:

  1. compare the fresh local bench against the previous round's bench
     on common queries;
  2. any uptick > 25% (and > 0.3 s absolute, so micro-query jitter
     doesn't spam re-runs) triggers an automatic fresh-JVM isolated
     re-run of that query via tools/runj_snap.sh graft.Bench <q>;
  3. both numbers are recorded under an "isolated_recheck" key INSIDE
     the local bench artifact;
  4. exit non-zero only when the ISOLATED number confirms the
     regression (isolated > 1.25x previous) - in-suite variance with a
     clean isolated number is recorded, not litigated.

Usage: bench_recheck.py <new_local_bench.json> <prev_bench.json>
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SNAP_CP (required - snapshot classes dir for runj_snap.sh),
       SPARK_GRAFT_CPUS / JAVA_EXTRA passed through to the re-run.
"""
import json, os, re, subprocess, sys

UPTICK = 1.25      # in-suite trigger AND isolated confirmation fence
ABS_FLOOR = 0.3    # seconds; below this, jitter dominates


def load(path):
    """Accept either the plain graft.Bench JSON line or the driver's
    BENCH_r*.json wrapper, whose metric line is embedded in `tail`
    (the r12 artifact shape: {n, rc, cpus, sf, tail, parsed})."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    for key in ("parsed", "tail"):
        v = d.get(key)
        if isinstance(v, dict) and "queries" in v:
            return v
        if isinstance(v, str):
            # the driver keeps only the LAST bytes of stdout, so the
            # metric line may be truncated mid-map — regex-recover
            # whatever (query, seconds) pairs survive. The lookahead
            # requires a terminating non-digit (comma/brace/space), so
            # a number cut mid-digits at the truncation point ("7.53"
            # -> "7.5") is DISCARDED instead of parsed as a plausible
            # wrong timing (r13 ADVICE low).
            qs = {m.group(1): float(m.group(2)) for m in
                  re.finditer(r'"(q\w+)":\s*([0-9.]+)(?=[,}\s])', v)}
            if qs:
                return {"queries": qs}
    raise SystemExit(f"[recheck] {path}: no queries map found")


def isolated_run(q, sfdir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sfdir)
    r = subprocess.run(["tools/runj_snap.sh", "graft.Bench", q],
                       capture_output=True, text=True, env=env)
    for line in r.stdout.splitlines():
        if '"metric"' in line:
            d = json.loads(line)
            return d["queries"].get(q)
    print(f"  [recheck] {q}: isolated run produced no metric line "
          f"(stderr tail: {r.stderr[-200:]!r})")
    return None


def main(new_path, prev_path):
    new, prev = load(new_path), load(prev_path)
    nq, pq = new["queries"], prev["queries"]
    sfdir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    common = sorted(set(nq) & set(pq))
    flagged = [q for q in common
               if nq[q] > pq[q] * UPTICK and nq[q] - pq[q] > ABS_FLOOR]
    print(f"[recheck] {len(common)} common queries, {len(flagged)} "
          f"upticks > {UPTICK}x + {ABS_FLOOR}s: {flagged}")
    rechecks, confirmed = {}, []
    for q in flagged:
        iso = isolated_run(q, sfdir)
        rechecks[q] = {"prev": pq[q], "in_suite": nq[q], "isolated": iso}
        if iso is None or iso > pq[q] * UPTICK:
            confirmed.append(q)
        print(f"  [recheck] {q}: prev={pq[q]} in_suite={nq[q]} "
              f"isolated={iso} -> "
              f"{'CONFIRMED REGRESSION' if q in confirmed else 'variance'}")
    if rechecks:
        new["isolated_recheck"] = rechecks
        with open(new_path, "w") as f:
            json.dump(new, f)
        print(f"[recheck] wrote isolated_recheck into {new_path}")
    if confirmed:
        print(f"[recheck] FAIL: isolated re-runs confirm regression on "
              f"{confirmed}")
        return 1
    print("[recheck] ok: no isolated-confirmed regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
