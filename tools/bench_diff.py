#!/usr/bin/env python3
"""Diff two bench artifacts (BENCH_DETAIL.json or BENCH_r{N}.json) and
print per-query deltas, worst regressions first — the tail-attribution
view VERDICT r8 item 6 asked for, runnable against committed artifacts.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [min_delta_sec]

Queries present in only one artifact are listed separately (slate
growth / removals). The REGRESSIONS.md noise floor applies: driver
deltas under ~2x are contention until a BenchOne warm repro says
otherwise.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d and "tail" in d:
        # driver BENCH_r{N}.json: the machine line is embedded in the
        # captured output tail — parse it back out
        tail = d["tail"]
        idx = tail.rfind('{"metric":"total"')
        if idx < 0:
            idx = tail.rfind('{"metric":"detail"')
        d = json.loads(tail[idx:].splitlines()[0]) if idx >= 0 else {}
    qs = d.get("queries", {})
    # BENCH_r short lines fold the tail into "_other_Nq" — drop it
    return {k: v for k, v in qs.items()
            if not k.startswith("_other") and isinstance(v, (int, float))}


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    old, new = load(old_path), load(new_path)
    both = sorted(set(old) & set(new), key=lambda k: new[k] - old[k],
                  reverse=True)
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'delta':>8s} {'ratio':>6s}")
    shown = 0
    for k in both:
        delta = new[k] - old[k]
        if abs(delta) < floor:
            continue
        ratio = new[k] / old[k] if old[k] > 0 else float("inf")
        print(f"{k:40s} {old[k]:8.2f} {new[k]:8.2f} {delta:+8.2f} {ratio:5.1f}x")
        shown += 1
    if not shown:
        print(f"(no per-query delta >= {floor}s)")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"\nadded ({len(added)}): " + ", ".join(
            f"{k}={new[k]:.2f}s" for k in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    to = sum(old[k] for k in both)
    tn = sum(new[k] for k in both)
    print(f"\nshared-slate total: {to:.1f}s -> {tn:.1f}s "
          f"({tn / to:.2f}x, {len(both)} queries)")


if __name__ == "__main__":
    main()
