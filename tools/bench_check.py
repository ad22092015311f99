#!/usr/bin/env python3
"""Per-query bench regression tripwire.

Compares a fresh bench artifact (default: target/bench.json, written by
`sbt "runMain graft.Bench"`) against the committed reference timings in
tools/bench_ref.json and flags:

  - REGRESSION: query slower than THRESHOLD x its reference time AND
    slower than ABS_FLOOR seconds (the floor keeps 0.1s -> 0.4s noise
    from tripping the wire -- this machine's noise band for identical
    code is wide; see VERDICT r4);
  - NEW / GONE: queries present on only one side (inventory drift).

Usage: python3 tools/bench_check.py [bench.json] [ref.json]
Exit code 1 if any regression is flagged, else 0.

After a round whose bench is accepted as the new normal, refresh the
reference:  cp target/bench.json tools/bench_ref.json
"""
import json
import sys

THRESHOLD = 3.0
ABS_FLOOR = 1.0  # seconds; below this, ratios are pure noise


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main():
    cur_path = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
    ref_path = sys.argv[2] if len(sys.argv) > 2 else "tools/bench_ref.json"
    cur, ref = load(cur_path), load(ref_path)

    regressions = []
    for name, t in sorted(cur.items()):
        r = ref.get(name)
        if r is None:
            print(f"NEW        {name}: {t:.2f}s (no reference)")
            continue
        if t > THRESHOLD * r and t > ABS_FLOOR:
            regressions.append((name, t, r))
    for name in sorted(set(ref) - set(cur)):
        print(f"GONE       {name}: in reference but not in current bench")
    for name, t, r in sorted(regressions, key=lambda x: -x[1] / x[2]):
        print(f"REGRESSION {name}: {t:.2f}s vs ref {r:.2f}s "
              f"({t / r:.1f}x)")
    tot_c = sum(cur.values())
    tot_r = sum(ref.get(k, 0.0) for k in cur)
    print(f"total: {tot_c:.1f}s vs ref {tot_r:.1f}s over "
          f"{len(cur)} queries; {len(regressions)} flagged")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
