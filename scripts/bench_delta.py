#!/usr/bin/env python3
"""Per-entry bench regression gate (VERDICT r8 #8).

Compares every query entry of two bench_full.json artifacts (previous
round vs current) and writes BENCH_DELTA.json: per-entry wall-median
ratio, executor-CPU-median ratio, and a flag for entries whose wall
ratio exceeds the threshold (default 1.3x). The CPU ratio is the
adjudication signal: a wall flag with cpu ratio ~1.0 is session noise
(the qc1 r8 lesson, PLANS.md "Round-9 qc1_msgpack regression
adjudication"); a wall flag with cpu ratio also >threshold is a real
slowdown to attribute.

Usage:
  python3 scripts/bench_delta.py OLD_full.json NEW_full.json [OUT.json]
  # previous round's artifact straight from git:
  git show <round-commit>:bench_full.json > /tmp/old.json

Exit code 0 always (informational artifact; the judge reads flags).
"""
import json
import sys

THRESH = 1.3


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_DELTA.json"
    oq, nq = old.get("queries", {}), new.get("queries", {})
    ocpu, ncpu = old.get("cpu_sec", {}), new.get("cpu_sec", {})
    entries = {}
    flagged = []
    for name in sorted(nq):
        nv = float(nq[name])
        ov = float(oq.get(name, -1))
        e = {"old_sec": ov, "new_sec": nv}
        if ov > 0 and nv > 0:
            e["ratio"] = round(nv / ov, 3)
        oc, nc = float(ocpu.get(name, -1)), float(ncpu.get(name, -1))
        if oc > 0 and nc > 0:
            e["cpu_ratio"] = round(nc / oc, 3)
        wall_flag = "ratio" in e and e["ratio"] > THRESH
        # sub-100ms entries flip >1.3x on scheduler jitter alone
        material = nv >= 0.1
        e["flag"] = bool(wall_flag and material)
        if e["flag"]:
            flagged.append(name)
        entries[name] = e
    new_only = sorted(set(nq) - set(oq))
    gone = sorted(set(oq) - set(nq))
    result = {
        "old": sys.argv[1],
        "new": sys.argv[2],
        "threshold": THRESH,
        "n_entries": len(entries),
        "flagged": flagged,
        "new_entries": new_only,
        "removed_entries": gone,
        "entries": entries,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"{len(flagged)} flagged of {len(entries)} "
          f"(+{len(new_only)} new, -{len(gone)} removed) -> {out_path}")
    for name in flagged:
        e = entries[name]
        cpu = e.get("cpu_ratio", "n/a")
        print(f"  FLAG {name}: wall x{e['ratio']} cpu x{cpu} "
              f"({e['old_sec']:.3f}s -> {e['new_sec']:.3f}s)")


if __name__ == "__main__":
    main()
