#!/usr/bin/env python3
"""Mechanized in-suite bench variance adjudication, v2.

v1 (r13) auto-re-ran >25% common-set upticks in a fresh JVM and exited
non-zero when the isolated number confirmed the regression. It failed
its first real close on two counts (r13 verdict "what's wrong" 1-2):

  * it compared against the PREVIOUS round's bench, which ran on the
    previous testdata GENERATION — so when the driver regenerated the
    parquet between rounds, 5 of 6 "confirmed regressions" were data,
    not code, and the close had to be overridden by hand with worktree
    builds of the old commit on the new data;
  * the two largest ABSOLUTE movers of the round (q177 +2.71 s at
    1.239x, q185 +3.05 s at 1.21x) slipped under the 1.25x ratio fence
    and were never isolated at all.

v2 mechanizes exactly the hand method:

  1. every run stamps the local bench artifact with `testdata_gen`
     (md5 over each parquet's name/size/footer in the SF dir) and
     `git_sha` (HEAD at recheck time);
  2. flagged = in-suite upticks >1.25x AND >0.3 s, UNION the top-5
     positive absolute deltas >0.3 s regardless of ratio;
  3. each flagged query gets a fresh-JVM isolated re-run of the NEW
     code (as v1); a clean isolated number is variance, recorded;
  4. a dirty isolated number CONFIRMS only when the baseline is known
     to be same-data (gen stamps present and equal). Otherwise the
     tool builds the BASELINE COMMIT in a git worktree (sha from the
     previous artifact's stamp, or --baseline-sha), re-runs the query
     on TODAY's data with the old classes, records
     `prev_code_same_data`, and confirms only when
     isolated > 1.25x * prev_code_same_data;
  5. exit non-zero only on a confirmed same-data regression — a
     testdata regeneration can no longer fail the close by itself.

v3 (r15) adds DRIVER-ARTIFACT adjudication (r14 verdict "what's
wrong" 1): BENCH_r14.json carried q212 12.34 s / q213 8.78 s / q219
5.93 s where the stamped local artifact had 3.16/3.08/4.96 on
identical code+data — the official record looked like a 3x regression
that never happened, and the v2 recheck only ever adjudicated the
local suite. With `--driver <BENCH_rN.json>`, rows where the driver's
number exceeds the local number by >DRIVER_FENCE and >ABS_FLOOR get a
fresh-JVM isolated re-run: isolated ~ local ⇒ the driver row was
run-context contention (recorded, pass); isolated reproducing the
driver-high number ⇒ the LOCAL artifact is the anomaly (fail — the
close must not ship an optimistic record).

v4.2 (r16): (a) the median-of-3 escalation retries failed runs and,
when a side still comes up short, truncates BOTH sides to the same
odd length before taking medians — the v4.1 form compared
news[len//2] on an even list against the same index on an odd one,
an asymmetric comparison that could flip borderline verdicts (r15
ADVICE); (b) driver rows whose artifacts carry `run_context` stamps
(graft.Bench r16: loadavg + other-live-JVM count at run start/end)
adjudicate WITHOUT a fresh-JVM re-run when the driver's context shows
strictly more concurrent JVMs than the local run's — the contention
explanation the r14/r15 closes spent 679 s of isolation re-proving.

v4.3 (r17, closes the r16 ADVICE medium): the context fast path now
requires strictly-more other JVMs AND a loadavg at least 2.0 higher
on the driver run, and even then isolates ONE sampled flagged row
(largest absolute gap) — if that fresh-JVM run reproduces the
driver-high number, the fast path is rejected and every flagged row
isolates as before. A shared driver box can no longer disable the
anomalous-local check with incidental co-tenancy alone.

Usage: bench_recheck.py <new_local_bench.json> <prev_bench.json>
                        [--baseline-sha <sha>] [--driver <BENCH_rN.json>]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SNAP_CP (required - snapshot classes dir for runj_snap.sh),
       SPARK_GRAFT_CPUS / JAVA_EXTRA passed through to the re-runs.
"""
import hashlib, json, os, re, subprocess, sys

UPTICK = 1.25      # ratio trigger AND confirmation fence
ABS_FLOOR = 0.3    # seconds; below this, jitter dominates
TOP_ABS = 5        # top-N absolute movers isolated regardless of ratio
DRIVER_FENCE = 2.0 # driver-vs-local ratio that demands adjudication
WORKTREE = "target/recheck_wt"


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
            # recover the run_context stamp (r16) if it survived the
            # driver's stdout-tail truncation
            ctx = None
            m = re.search(r'"run_context":(\{[^{}]*\})', v)
            if m:
                try:
                    ctx = json.loads(m.group(1))
                except ValueError:
                    ctx = None
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
                out = {"queries": qs}
                if ctx:
                    out["run_context"] = ctx
                return out
    raise SystemExit(f"[recheck] {path}: no queries map found")


def testdata_gen(sfdir):
    """Generation id of an SF dir: md5 over (relpath, size, last 4KB)
    of every parquet part, sorted — regenerated data changes file
    contents even at identical sizes (the footer carries row-group
    stats), so the id rolls with the generation."""
    h = hashlib.md5()
    parts = []
    for root, _, files in os.walk(sfdir):
        for fn in files:
            if fn.endswith(".parquet") or fn == "_SUCCESS":
                parts.append(os.path.join(root, fn))
    for p in sorted(parts):
        st = os.stat(p)
        h.update(os.path.relpath(p, sfdir).encode())
        h.update(str(st.st_size).encode())
        if st.st_size > 0:
            with open(p, "rb") as f:
                f.seek(max(0, st.st_size - 4096))
                h.update(f.read())
    return h.hexdigest()


def git_head():
    r = subprocess.run(["git", "rev-parse", "HEAD"],
                       capture_output=True, text=True)
    return r.stdout.strip() or None


def isolated_run(q, sfdir, snap_cp=None):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sfdir)
    if snap_cp:
        env["SNAP_CP"] = snap_cp
    r = subprocess.run(["tools/runj_snap.sh", "graft.Bench", q],
                       capture_output=True, text=True, env=env)
    for line in r.stdout.splitlines():
        if '"metric"' in line:
            d = json.loads(line)
            return d["queries"].get(q)
    print(f"  [recheck] {q}: isolated run produced no metric line "
          f"(stderr tail: {r.stderr[-200:]!r})")
    return None


def build_baseline(sha):
    """git-worktree the baseline commit and compile it; returns the
    classes dir, or None on failure. Idempotent per sha."""
    marker = os.path.join(WORKTREE, f".built_{sha}")
    classes = os.path.join(WORKTREE, "target/scala-2.13/classes")
    if os.path.exists(marker):
        return classes
    subprocess.run(["git", "worktree", "remove", "--force", WORKTREE],
                   capture_output=True)
    r = subprocess.run(["git", "worktree", "add", "--force", WORKTREE, sha],
                       capture_output=True, text=True)
    if r.returncode != 0:
        print(f"  [recheck] worktree add failed: {r.stderr[-300:]!r}")
        return None
    print(f"  [recheck] compiling baseline {sha[:9]} in {WORKTREE} ...")
    r = subprocess.run(["sbt", "-batch", "compile"], cwd=WORKTREE,
                       capture_output=True, text=True)
    if r.returncode != 0 or not os.path.isdir(classes):
        print(f"  [recheck] baseline compile failed: {r.stdout[-300:]!r}")
        return None
    open(marker, "w").close()
    return classes


def main(argv):
    new_path, prev_path = argv[0], argv[1]
    baseline_sha = None
    if "--baseline-sha" in argv:
        baseline_sha = argv[argv.index("--baseline-sha") + 1]
    with open(new_path) as f:
        new_doc = json.load(f)
    new, prev = load(new_path), load(prev_path)
    nq, pq = new["queries"], prev["queries"]
    sfdir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # ---- stamp the new artifact (consumed by NEXT round's recheck) ----
    gen_now = testdata_gen(sfdir)
    sha_now = git_head()
    new_doc.setdefault("testdata_gen", gen_now)
    new_doc.setdefault("git_sha", sha_now)

    with open(prev_path) as f:
        prev_doc = json.load(f)
    gen_prev = prev_doc.get("testdata_gen")
    same_data = gen_prev is not None and gen_prev == gen_now
    baseline_sha = baseline_sha or prev_doc.get("git_sha")
    print(f"[recheck] testdata_gen now={gen_now[:12]} "
          f"prev={'unknown' if gen_prev is None else gen_prev[:12]} "
          f"-> same_data={same_data}; baseline_sha="
          f"{(baseline_sha or 'unknown')[:9]}")

    # ---- flag: ratio fence UNION top-N absolute movers ----------------
    common = sorted(set(nq) & set(pq))
    ratio_flagged = [q for q in common
                     if nq[q] > pq[q] * UPTICK and nq[q] - pq[q] > ABS_FLOOR]
    movers = sorted((q for q in common if nq[q] - pq[q] > ABS_FLOOR),
                    key=lambda q: pq[q] - nq[q])[:TOP_ABS]
    flagged = sorted(set(ratio_flagged) | set(movers))
    print(f"[recheck] {len(common)} common queries; ratio-flagged "
          f"{ratio_flagged}; top-{TOP_ABS} movers {movers}")

    rechecks, confirmed = {}, []
    prev_classes = None
    for q in flagged:
        iso = isolated_run(q, sfdir)
        rec = {"prev": pq[q], "in_suite": nq[q], "isolated": iso,
               "same_data": same_data}
        clean = iso is not None and iso <= pq[q] * UPTICK
        if not clean:
            # the r13 hand method, mechanized — and since r15 applied
            # to SAME-DATA dirty rows too: the previous artifact's
            # number embeds the previous round's ENVIRONMENT (the r15
            # close confirmed three same-data "regressions" on
            # untouched queries that the baseline-commit build
            # reproduced bit-for-bit on today's box — drift, not
            # code). Rebuild the baseline commit and ask what ITS
            # code costs on TODAY's data in TODAY's environment; only
            # a code-vs-code gap confirms.
            if prev_classes is None and baseline_sha:
                prev_classes = build_baseline(baseline_sha)
            if prev_classes:
                base = isolated_run(q, sfdir, snap_cp=os.path.abspath(
                    prev_classes))
                rec["prev_code_same_data"] = base
                clean = (iso is not None and base is not None
                         and iso <= base * UPTICK)
                if not clean and iso is not None and base is not None:
                    # single-shot escalation (v4.1): one isolated pair
                    # on a 1-2 s row disperses +-30% run-to-run (r15:
                    # the same code-vs-code comparison flipped verdicts
                    # between two closes hours apart) — a CONFIRM
                    # verdict must survive the median of 3 runs per
                    # side, not one coin flip. v4.2: failed runs are
                    # RETRIED (up to 2 extra attempts per side); if a
                    # side still comes up short, both sides truncate to
                    # the same odd length (k smallest each) so the
                    # median comparison stays symmetric — the v4.1 form
                    # indexed len//2 into lists of different parity.
                    def runs3(first, snap=None):
                        out, tries = [first], 0
                        while len(out) < 3 and tries < 4:
                            v = isolated_run(q, sfdir, snap_cp=snap)
                            if v is not None:
                                out.append(v)
                            tries += 1
                        return sorted(out)
                    news = runs3(iso)
                    olds = runs3(base,
                                 snap=os.path.abspath(prev_classes))
                    rec["isolated_runs"] = news
                    rec["prev_code_runs"] = olds
                    k = min(len(news), len(olds))
                    if k % 2 == 0:
                        k -= 1
                    if k >= 1:
                        med_n = sorted(news[:k])[k // 2]
                        med_o = sorted(olds[:k])[k // 2]
                        rec["isolated_median"] = med_n
                        rec["prev_code_median"] = med_o
                        clean = med_n <= med_o * UPTICK
            else:
                rec["prev_code_same_data"] = None
                print(f"  [recheck] {q}: no baseline build available — "
                      "treating dirty isolated number as confirmed")
        rechecks[q] = rec
        if not clean:
            confirmed.append(q)
        print(f"  [recheck] {q}: prev={pq[q]} in_suite={nq[q]} "
              f"isolated={iso} "
              f"prev_code_same_data={rec.get('prev_code_same_data', 'n/a')} "
              f"-> {'CONFIRMED REGRESSION' if q in confirmed else 'variance'}")

    # ---- driver-artifact adjudication (v3) ----------------------------
    driver_bad = []
    if "--driver" in argv:
        driver_path = argv[argv.index("--driver") + 1]
        d_doc = load(driver_path)
        dq = d_doc["queries"]
        d_flagged = sorted(q for q in set(dq) & set(nq)
                           if dq[q] > nq[q] * DRIVER_FENCE
                           and dq[q] - nq[q] > ABS_FLOOR)
        print(f"[recheck] driver artifact {driver_path}: "
              f"{len(set(dq) & set(nq))} common rows; "
              f">={DRIVER_FENCE}x-over-local flagged {d_flagged}")
        # ---- run-context fast path (v4.3): the v4.2 form adjudicated
        # EVERY flagged row as contention whenever the driver saw more
        # live JVMs than the local run — but a shared driver box
        # almost always does, so that one coarse scalar could mask a
        # real regression forever (r16 ADVICE, medium). v4.3 requires
        # BOTH context signals (strictly more other JVMs AND a 1-min
        # loadavg at least CTX_LOAD_DELTA higher), and even then
        # ISOLATES ONE SAMPLED flagged row — the one with the largest
        # absolute gap, where contention inflation should be most
        # reproducible — to confirm the explanation generalizes. If
        # the sampled fresh-JVM run reproduces the driver-high number
        # instead, the fast path is rejected and every row isolates.
        CTX_LOAD_DELTA = 2.0
        def other_jvms(doc):
            c = doc.get("run_context") or {}
            vals = [c.get("n_other_java_start"), c.get("n_other_java_end")]
            vals = [v for v in vals if isinstance(v, (int, float)) and v >= 0]
            return max(vals) if vals else None
        def loadavg(doc):
            c = doc.get("run_context") or {}
            vals = [c.get("loadavg_start"), c.get("loadavg_end")]
            vals = [v for v in vals if isinstance(v, (int, float)) and v >= 0]
            return max(vals) if vals else None
        d_ctx, l_ctx = other_jvms(d_doc), other_jvms(new)
        d_load, l_load = loadavg(d_doc), loadavg(new)
        ctx_explains = (d_ctx is not None and l_ctx is not None
                        and d_ctx > l_ctx
                        and d_load is not None and l_load is not None
                        and d_load - l_load >= CTX_LOAD_DELTA)
        sampled_q, sampled_iso = None, None
        if d_flagged and ctx_explains:
            # confirm on the widest-gap row before trusting the context
            sampled_q = max(d_flagged, key=lambda q: dq[q] - nq[q])
            sampled_iso = isolated_run(sampled_q, sfdir)
            sampled_reproduced = (sampled_iso is not None
                                  and sampled_iso > dq[sampled_q] / DRIVER_FENCE)
            if sampled_reproduced:
                print(f"[recheck] run_context claimed contention but the "
                      f"sampled isolation ({sampled_q}: iso={sampled_iso} "
                      f"vs driver={dq[sampled_q]}) REPRODUCES the driver "
                      f"number — rejecting the fast path, isolating all")
                ctx_explains = False
        if d_flagged:
            print(f"[recheck] run_context: driver other-JVMs={d_ctx} "
                  f"loadavg={d_load} | local other-JVMs={l_ctx} "
                  f"loadavg={l_load} -> "
                  f"{'contention self-identified (JVMs+loadavg) and sampled isolation confirms' if ctx_explains else 'no sufficient context explanation, isolating'}")
        d_rechecks = {}
        for q in d_flagged:
            if ctx_explains:
                rec = {"driver": dq[q], "local": nq[q],
                       "driver_other_jvms": d_ctx,
                       "local_other_jvms": l_ctx,
                       "driver_loadavg": d_load,
                       "local_loadavg": l_load,
                       "verdict": "contention_by_context"}
                if q == sampled_q:
                    rec["isolated"] = sampled_iso
                    rec["sampled_confirmation"] = True
                d_rechecks[q] = rec
                print(f"  [recheck] driver-row {q}: driver={dq[q]} "
                      f"local={nq[q]} -> contention_by_context"
                      + (f" (sampled isolation {sampled_iso})"
                         if q == sampled_q else ""))
                continue
            iso = isolated_run(q, sfdir)
            # anomalous-local ONLY when the fresh idle JVM actually
            # REPRODUCES the driver-high number (lands within the
            # fence of it) — meaning the stamped local artifact
            # underreports; anything landing near the local number is
            # run-context contention on the driver's box. (The first
            # cut compared isolated to local×UPTICK, which misread
            # sub-second jitter on 0.4 s rows as an anomalous
            # artifact while the isolated number sat 3x BELOW the
            # driver row it was supposed to explain.)
            reproduced = iso is not None and iso > dq[q] / DRIVER_FENCE
            d_rechecks[q] = {"driver": dq[q], "local": nq[q],
                             "isolated": iso,
                             "verdict": "local_artifact_anomalous"
                                        if reproduced else "contention"}
            if reproduced:
                driver_bad.append(q)
            print(f"  [recheck] driver-row {q}: driver={dq[q]} "
                  f"local={nq[q]} isolated={iso} -> "
                  f"{d_rechecks[q]['verdict']}")
        if d_rechecks:
            new_doc["driver_recheck"] = d_rechecks

    if rechecks:
        new_doc["isolated_recheck"] = rechecks
    with open(new_path, "w") as f:
        json.dump(new_doc, f)
    stamps = ["testdata_gen", "git_sha"]
    if rechecks:
        stamps.append("isolated_recheck")
    if new_doc.get("driver_recheck"):
        stamps.append("driver_recheck")
    print(f"[recheck] stamped {new_path} ({', '.join(stamps)})")
    if confirmed:
        print(f"[recheck] FAIL: same-data evidence confirms regression on "
              f"{confirmed}")
        return 1
    if driver_bad:
        print(f"[recheck] FAIL: fresh-JVM runs reproduce the driver-high "
              f"numbers on {driver_bad} — the local artifact is the anomaly")
        return 1
    print("[recheck] ok: no same-data-confirmed regressions"
          + ("; driver-vs-local divergences adjudicated as contention"
             if "--driver" in argv else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
