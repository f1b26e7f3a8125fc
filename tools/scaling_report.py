#!/usr/bin/env python3
"""DEV-ONLY generator for SCALING.md (round-8 verdict #1).

Reads the four bench ledgers produced by graft.Bench at
sf0.001 / sf0.01 / sf0.1 / sf0.3x (the ScaleUp-derived 3x timing
corpus) plus the EngineLadder JSON lines, and emits the per-key
scaling table with growth verdicts.

Usage: python3 tools/scaling_report.py /tmp/ladder > SCALING.md.body
"""
import json, os, sys

# fact-row growth between adjacent rungs: sf0.001->sf0.01 and
# sf0.01->sf0.1 are 10x in lineitem/events/documents rows;
# sf0.1->sf0.3x is 3x
STEPS = [("sf0.001", "sf0.01", 10.0), ("sf0.01", "sf0.1", 10.0), ("sf0.1", "sf0.3x", 3.0)]

def load(d, sf):
    p = os.path.join(d, f"bench_{sf}.json")
    with open(p) as f:
        j = json.loads(f.read())
    return j


def main():
    d = sys.argv[1]
    led = {sf: load(d, sf) for sf in ["sf0.001", "sf0.01", "sf0.1", "sf0.3x"]}
    keys = sorted(led["sf0.1"]["queries"])
    rows = []
    for k in keys:
        t = {sf: led[sf]["queries"].get(k, -1) for sf in led}
        # a failed key carries a -1 sentinel; ANY non-positive sample
        # (numerator or denominator) poisons the ratio to NaN so it
        # can't print a misleading negative number or silently escape
        # the superlinear bucket
        def ratio(hi, lo):
            return t[hi] / t[lo] if t[hi] > 0 and t[lo] > 0 else float("nan")
        r01 = ratio("sf0.1", "sf0.01")
        r3x = ratio("sf0.3x", "sf0.1")
        rows.append((k, t, r01, r3x))
    print("| key | sf0.001 | sf0.01 | sf0.1 | sf0.3x | x(0.01->0.1) /10x rows | x(0.1->0.3x) /3x rows |")
    print("|---|---|---|---|---|---|---|")
    for k, t, r01, r3x in rows:
        print(f"| `{k}` | {t['sf0.001']:.2f} | {t['sf0.01']:.2f} | {t['sf0.1']:.2f} | "
              f"{t['sf0.3x']:.2f} | {r01:.2f}x | {r3x:.2f}x |")
    # summary buckets on the top rung (0.1 -> 0.3x, 3x rows)
    sup = [(k, r3x, t) for k, t, _, r3x in rows if r3x == r3x and r3x > 4.5 and t["sf0.3x"] > 1.0]
    print()
    print("superlinear on the 3x rung (ratio > 1.5x rows AND > 1s absolute):")
    for k, r, t in sorted(sup, key=lambda x: -x[1]):
        print(f"  {k}: {r:.2f}x ({t['sf0.1']:.2f}s -> {t['sf0.3x']:.2f}s)")
    for sf in led:
        j = led[sf]
        print(f"{sf}: total={j['value']}s sentinel={j.get('sentinel_sec')} floor={j.get('stream_floor_sec')}")


if __name__ == "__main__":
    main()
