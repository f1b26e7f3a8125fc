#!/usr/bin/env python3
"""DEV-ONLY generator for SCALING.md's per-key table (round-8
verdict #1, extended round 9 with the sf1x rung).

Reads the bench ledgers produced by graft.Bench at
sf0.001 / sf0.01 / sf0.1 / sf0.3x (the ScaleUp-derived 3x timing
corpus) and, when present, sf1x (the x10 corpus, single-rep) plus the
EngineLadder JSON lines, and emits the per-key scaling table with
growth verdicts.

Usage: python3 tools/scaling_report.py scaling > /tmp/scaling_body.md
"""
import json, os, sys


def load(d, sf):
    p = os.path.join(d, f"bench_{sf}.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.loads(f.read())


def main():
    d = sys.argv[1]
    rungs = ["sf0.001", "sf0.01", "sf0.1", "sf0.3x", "sf1x"]
    led = {sf: j for sf in rungs if (j := load(d, sf)) is not None}
    # the four base rungs are REQUIRED (the table formats their cells
    # unconditionally); only the sf1x bonus column is optional — fail
    # loudly on a partial campaign instead of a KeyError mid-table
    missing = [sf for sf in rungs[:4] if sf not in led]
    if missing:
        raise SystemExit(f"missing required ledger(s): {missing} in {d} "
                         "(run tools/scale_campaign.sh to completion first)")
    have1x = "sf1x" in led
    keys = sorted(led["sf0.1"]["queries"])
    rows = []
    for k in keys:
        t = {sf: led[sf]["queries"].get(k, -1) for sf in led}
        # a failed key carries a -1 sentinel; ANY non-positive sample
        # (numerator or denominator) poisons the ratio to NaN so it
        # can't print a misleading negative number or silently escape
        # the superlinear bucket
        def ratio(hi, lo):
            return t[hi] / t[lo] if t.get(hi, -1) > 0 and t.get(lo, -1) > 0 else float("nan")
        r01 = ratio("sf0.1", "sf0.01")
        r3x = ratio("sf0.3x", "sf0.1")
        r1x = ratio("sf1x", "sf0.1") if have1x else float("nan")
        rows.append((k, t, r01, r3x, r1x))
    hdr = "| key | sf0.001 | sf0.01 | sf0.1 | sf0.3x | x(0.01->0.1) /10x rows | x(0.1->0.3x) /3x rows |"
    sep = "|---|---|---|---|---|---|---|"
    if have1x:
        hdr = hdr + " sf1x¹ | x(0.1->1x) /10x rows |"
        sep += "---|---|"
    print(hdr)
    print(sep)
    for k, t, r01, r3x, r1x in rows:
        line = (f"| `{k}` | {t['sf0.001']:.2f} | {t['sf0.01']:.2f} | {t['sf0.1']:.2f} | "
                f"{t['sf0.3x']:.2f} | {r01:.2f}x | {r3x:.2f}x |")
        if have1x:
            line += f" {t['sf1x']:.2f} | {r1x:.2f}x |"
        print(line)
    # summary buckets on the decisive rung (0.1 -> 0.3x, 3x rows)
    sup = [(k, r3x, t) for k, t, _, r3x, _ in rows if r3x == r3x and r3x > 4.5 and t["sf0.3x"] > 1.0]
    print()
    print("superlinear on the 3x rung (ratio > 1.5x rows AND > 1s absolute):")
    for k, r, t in sorted(sup, key=lambda x: -x[1]):
        print(f"  {k}: {r:.2f}x ({t['sf0.1']:.2f}s -> {t['sf0.3x']:.2f}s)")
    if have1x:
        sup1 = [(k, r1x, t) for k, t, _, _, r1x in rows
                if r1x == r1x and r1x > 15.0 and t["sf1x"] > 2.0]
        print()
        print("superlinear on the 10x rung (ratio > 1.5x rows AND > 2s absolute; single-rep):")
        for k, r, t in sorted(sup1, key=lambda x: -x[1]):
            print(f"  {k}: {r:.2f}x ({t['sf0.1']:.2f}s -> {t['sf1x']:.2f}s)")
    for sf in led:
        j = led[sf]
        print(f"{sf}: total={j['value']}s reps={j.get('reps')} sentinel={j.get('sentinel_sec')} "
              f"floor={j.get('stream_floor_sec')}")


if __name__ == "__main__":
    main()
