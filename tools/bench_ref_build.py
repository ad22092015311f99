#!/usr/bin/env python3
"""Build tools/bench_ref.json as per-query MEDIANS of N full-suite
bench artifacts captured in ONE sitting.

Why medians of one sitting (VERDICT r7 item 2): the previous reference
was an elementwise MIN across historical runs — a floor assembled from
every query's luckiest-ever moment, on a machine with order-of-
magnitude one-off spikes. Any honest fresh run then "regresses" against
a number no single session ever achieved, and the flag list stops
meaning anything. A same-sitting median is a time the suite actually
achieves, spikes land in the tail where the median ignores them, and a
2x flag against it is a claim worth adjudicating.

Usage:
  python3 tools/bench_ref_build.py run1.json run2.json [run3.json ...] \
      [-o tools/bench_ref.json]

Each input is a `graft.Bench` artifact (target/bench.json shape). The
output keeps the {"queries": {...}} shape bench_check.py reads, plus
method metadata.
"""
import json
import statistics
import sys


def main():
    args = sys.argv[1:]
    out = "tools/bench_ref.json"
    if "-o" in args:
        i = args.index("-o")
        out = args[i + 1]
        del args[i:i + 2]
    if len(args) < 2:
        sys.exit("need at least 2 bench artifacts from one sitting")
    runs = []
    for p in args:
        with open(p) as f:
            runs.append(json.load(f)["queries"])
    names = set(runs[0])
    for r in runs[1:]:
        if set(r) != names:
            sys.exit("bench artifacts disagree on the query inventory — "
                     "capture all runs from the same build")
    queries = {n: round(statistics.median(r[n] for r in runs), 4)
               for n in sorted(names)}
    doc = {
        "method": f"median-of-{len(runs)}",
        "runs": len(runs),
        "queries": queries,
        "metric": "total",
        "value": round(sum(queries.values()), 2),
        "unit": "sec",
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out}: {len(queries)} queries, median total "
          f"{doc['value']:.1f}s ({doc['method']})")


if __name__ == "__main__":
    main()
