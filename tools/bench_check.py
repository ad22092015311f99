#!/usr/bin/env python3
"""Per-query bench regression tripwire — with steady-state adjudication.

Methodology (VERDICT r7 item 2):

  1. The reference `tools/bench_ref.json` is a per-query MEDIAN of >= 2
     full-suite runs captured in ONE sitting (`tools/bench_ref_build.py`)
     — never an elementwise-min floor, which flagged every honest run
     against lucky historical moments.
  2. A fresh full-suite run only nominates CANDIDATES: queries slower
     than THRESHOLD x their reference median AND slower than ABS_FLOOR
     seconds (below the floor, ratios are pure noise on this machine).
  3. Candidates are ADJUDICATED by `graft.TimeOne` (3 runs in a fresh
     session; the median absorbs the cold first run): only a steady-
     state median > THRESHOLD x ref is a REGRESSION. Full-suite
     sessions carry GC/JIT spikes an order of magnitude above steady
     state — a single-session number is never evidence by itself.

Usage:
  python3 tools/bench_check.py [bench.json] [ref.json] [--no-adjudicate]
                               [--sf-dir DIR]

Adjudication shells out to the compiled classes
(target/scala-2.13/classes + /opt/spark/jars); pass --no-adjudicate to
only print candidates (exit 0 unless adjudicated regressions exist).

After a round whose bench profile is accepted as the new normal,
REBUILD the reference from >= 2 fresh same-sitting runs:
  SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Bench"   # x3, saving each
  python3 tools/bench_ref_build.py run1.json run2.json run3.json
"""
import json
import re
import statistics
import subprocess
import sys

THRESHOLD = 2.0
ABS_FLOOR = 1.0  # seconds; below this, ratios are pure noise

CLASSPATH = "target/scala-2.13/classes:/opt/spark/jars/*"

# Spark 4.x on JDK 17 needs the module opens spark-submit would inject
# (matches build.sbt's jdk17AddOpens) — without them TimeOne dies on
# the first query that decodes a Date/Timestamp row on the driver
# (sun.util.calendar access), which silently turned those candidates
# into UNRESOLVED "regressions".
ADD_OPENS = [f"--add-opens={p}=ALL-UNNAMED" for p in [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"]]

# Whole-sitting drift canaries (VERDICT r9 task 1): fixed, >1s,
# pure-compute queries on STANDALONE code paths — none rides a
# session-memoized shared build and none shares helpers with
# actively-developed operators (ADVICE r10: llm_vec_cov was retired
# when covCells became the memoized PCA-family build; llm_cc_bigstar
# when the dedup/graph family gate landed). Their
# steady-state-vs-reference ratio measures MACHINE drift (this box
# runs whole sittings 25-40% slower at times, on untouched code); the
# geometric mean is the sitting's drift factor. Recorded beside every
# BENCH_rN (tools/drift_rN.json) so cross-round totals can be
# normalized before anyone calls a number a regression. Canary-set
# changes reset cross-round drift comparability — note them in
# STATE.md beside the bench_ref rebuild they accompany.
# r13 canary refresh (VERDICT r12 item 1b): llm_bpe_apply and
# composite_q11 were retired — both moved ONTO session-memoized shared
# builds in r12 (the BPE merge chain; the persisted partsupp),
# violating the standalone doctrine above. Replacements: join_theta
# (banded non-equi join, r13 ref median 1.40s) and agg_hist_eqdepth
# (percentile-gate histogram, r13 ref median 1.27s) — both >1s, pure
# compute, riding no shared build and no helper touched in r12/r13.
DRIFT_CANARIES = ["diag_fk_coverage", "join_spatial_grid",
                  "join_theta", "agg_hist_eqdepth"]

# Shared-build families (VERDICT r10 task 2): these queries ride ONE
# session-memoized persisted frame (DedupOps pair-frame + CC build;
# LlmOps ANN/PQ corpus structures; LlmOps covCells for the PCA trio).
# The one-time build lands on whichever member a full-suite run
# happens to execute FIRST, so per-member suite times shuffle whenever
# the registry grows — a member can read >2x while the family total is
# flat. Adjudication therefore compares the FAMILY total
# (drift-divided) first: a member candidate whose family total is
# within FAMILY_THRESHOLD of the family reference is build-attribution
# noise, not a regression. A family total past the gate still sends
# every member candidate to TimeOne as usual.
FAMILIES = {
    "dedup_graph": ["llm_dedup_", "llm_graph_", "llm_cc_",
                    "llm_communities", "llm_pagerank"],
    # llm_knn_agreement / llm_hard_negatives ride the SAME session-
    # memoized IVF index as the llm_ann_* members (LlmOps.ivfIndex) —
    # added r13 after the index build landed on llm_knn_agreement in a
    # full-suite run and read as a 2.6x phantom.
    "ann": ["llm_ann_", "llm_pq_", "llm_ivf_", "llm_knn_agreement",
            "llm_hard_negatives"],
    "pca": ["llm_vec_cov", "llm_pca_"],
    # r12 shared builds: the BPE merge chain serves train+apply; the
    # language-ID hit frame serves the lang trio + cohen_kappa; the
    # derived partsupp serves the TPC-H consumers. The one-time build
    # lands on whichever member runs first, exactly like dedup_graph.
    "bpe": ["llm_bpe_train", "llm_bpe_apply"],
    "langid": ["llm_lang_id", "llm_lang_mismatch", "llm_lang_margin",
               "agg_cohen_kappa"],
    "tpch_ps": ["composite_q2", "composite_q9", "composite_q11"],
}
FAMILY_THRESHOLD = 1.5


def family_of(name):
    for fam, prefixes in FAMILIES.items():
        if any(name.startswith(p) for p in prefixes):
            return fam
    return None


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def steady_state(names, sf_dir):
    """3-run TimeOne medians for `names`, one fresh session."""
    cmd = ["java", "-Xmx16g"] + ADD_OPENS + ["-cp", CLASSPATH,
           "graft.TimeOne", f"-dir={sf_dir}"] + list(names)
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=1800).stdout
    runs = {}
    for m in re.finditer(r"^(\S+) run\d ([0-9.]+) s", out, re.M):
        runs.setdefault(m.group(1), []).append(float(m.group(2)))
    return {n: statistics.median(ts) for n, ts in runs.items() if ts}


def drift_marker(sf_dir, ref, out_path=None):
    """Steady-state the drift canaries, return the sitting's drift
    factor (geometric mean of steady/ref), optionally recording it."""
    medians = steady_state(DRIFT_CANARIES, sf_dir)
    ratios = {}
    for c in DRIFT_CANARIES:
        if c in medians and ref.get(c):
            ratios[c] = medians[c] / ref[c]
    if not ratios:
        print("DRIFT      unresolved: no canary produced a timing")
        return 1.0
    import math
    factor = math.exp(sum(math.log(r) for r in ratios.values())
                      / len(ratios))
    detail = ", ".join(f"{c} {r:.2f}x" for c, r in sorted(ratios.items()))
    print(f"DRIFT      sitting factor {factor:.2f}x ({detail})")
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"factor": round(factor, 4),
                       "canaries": {c: {"steady": round(medians[c], 3),
                                        "ref": ref[c]}
                                    for c in ratios}}, f, indent=2)
        print(f"DRIFT      recorded to {out_path}")
    return factor


def main():
    args = [a for a in sys.argv[1:]]
    adjudicate = "--no-adjudicate" not in args
    args = [a for a in args if a != "--no-adjudicate"]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    drift_out = None
    want_drift = "--drift" in args
    if want_drift:
        i = args.index("--drift")
        if i + 1 < len(args) and args[i + 1].endswith(".json") \
                and not args[i + 1].startswith("--"):
            drift_out = args[i + 1]
            del args[i:i + 2]
        else:
            del args[i]
    cur_path = args[0] if len(args) > 0 else "target/bench.json"
    ref_path = args[1] if len(args) > 1 else "tools/bench_ref.json"
    cur, ref = load(cur_path), load(ref_path)

    drift = 1.0
    if want_drift:
        drift = drift_marker(sf_dir, ref, drift_out)

    # family totals over members present in BOTH runs (comparable sums)
    fam_cur, fam_ref = {}, {}
    for name, t in cur.items():
        fam = family_of(name)
        if fam and name in ref:
            fam_cur[fam] = fam_cur.get(fam, 0.0) + t
            fam_ref[fam] = fam_ref.get(fam, 0.0) + ref[name]

    candidates = []
    for name, t in sorted(cur.items()):
        r = ref.get(name)
        if r is None:
            print(f"NEW        {name}: {t:.2f}s (no reference)")
            continue
        if t > THRESHOLD * r and t > ABS_FLOOR:
            fam = family_of(name)
            if fam and fam_ref.get(fam):
                fr = (fam_cur[fam] / drift) / fam_ref[fam]
                if fr <= FAMILY_THRESHOLD:
                    print(f"FAMILY-OK  {name}: {t:.2f}s vs ref {r:.2f}s "
                          f"({t / r:.1f}x) but family '{fam}' total "
                          f"{fam_cur[fam]:.1f}s vs {fam_ref[fam]:.1f}s "
                          f"({fr:.2f}x drift-divided) — shared-build "
                          f"attribution shuffle, not a regression")
                    continue
                print(f"FAMILY-HOT {name}: family '{fam}' total "
                      f"{fam_cur[fam]:.1f}s vs {fam_ref[fam]:.1f}s "
                      f"({fr:.2f}x) exceeds {FAMILY_THRESHOLD}x — "
                      f"adjudicating the member")
            candidates.append((name, t, r))
    for name in sorted(set(ref) - set(cur)):
        print(f"GONE       {name}: in reference but not in current bench")

    regressions = []
    if candidates and adjudicate:
        print(f"adjudicating {len(candidates)} candidate(s) via TimeOne "
              f"steady state on {sf_dir} ...")
        medians = steady_state([c[0] for c in candidates], sf_dir)
        for name, t, r in candidates:
            m = medians.get(name)
            # divide out whole-sitting machine drift (1.0 when --drift
            # was not requested) so a uniformly-slow box doesn't turn
            # every honest query into a "regression"
            mn = m / drift if m is not None else None
            if m is None:
                print(f"UNRESOLVED {name}: TimeOne produced no timing — "
                      f"treat as regression ({t:.2f}s vs ref {r:.2f}s)")
                regressions.append((name, t, r))
            elif mn > THRESHOLD * r and mn > ABS_FLOOR:
                print(f"REGRESSION {name}: steady {m:.2f}s "
                      f"(drift-normalized {mn:.2f}s) vs ref "
                      f"{r:.2f}s ({mn / r:.1f}x; suite run {t:.2f}s)")
                regressions.append((name, mn, r))
            else:
                print(f"NOISE      {name}: suite run {t:.2f}s but steady "
                      f"{m:.2f}s (normalized {mn:.2f}s) vs ref {r:.2f}s "
                      f"— session spike / sitting drift")
    elif candidates:
        for name, t, r in sorted(candidates, key=lambda x: -x[1] / x[2]):
            print(f"CANDIDATE  {name}: {t:.2f}s vs ref {r:.2f}s "
                  f"({t / r:.1f}x) — unadjudicated")
        regressions = candidates

    tot_c = sum(cur.values())
    tot_r = sum(ref.get(k, 0.0) for k in cur)
    print(f"total: {tot_c:.1f}s vs ref {tot_r:.1f}s over "
          f"{len(cur)} queries; {len(regressions)} flagged")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
