#!/usr/bin/env python3
"""DEV-ONLY: fold healed per-key re-measurements into a scaling
ledger (the round-8 'keys healed mid-round' protocol, scripted):
replaces the named keys' median + samples with the heal run's and
recomputes the total as the sum of positive medians. The heal run
used the same Bench protocol (same reps as the target ledger's rung,
same warmup/cooldown/noop-sink).

Usage: patch_ledger.py <target_ledger> <heal_ledger> [key ...]
       (no keys -> every key present in the heal ledger)
"""
import json, sys


def main():
    target_p, heal_p, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    with open(target_p) as f:
        target = json.load(f)
    with open(heal_p) as f:
        heal = json.load(f)
    # the docstring's protocol ("same Bench protocol, same reps") is a
    # precondition, not a promise: folding a wrong-SF or wrong-reps
    # heal would silently corrupt the regression record — exactly the
    # failure class Bench's record-SF guard exists to prevent
    if heal.get("sf") != target.get("sf"):
        raise SystemExit(
            f"refusing to fold: heal sf={heal.get('sf')!r} != target sf={target.get('sf')!r}")
    if heal.get("reps") != target.get("reps"):
        raise SystemExit(
            f"refusing to fold: heal reps={heal.get('reps')!r} != target reps={target.get('reps')!r}")
    keys = keys or sorted(heal["queries"])
    for k in keys:
        v = heal["queries"][k]
        if v < 0:
            raise SystemExit(f"refusing to fold a FAILED heal value for {k}")
        target["queries"][k] = v
        if "samples" in target and "samples" in heal:
            target["samples"][k] = heal["samples"][k]
    target["value"] = round(sum(v for v in target["queries"].values() if v >= 0), 3)
    # a healed e_stream key's operator share (median - harness floor)
    # must track its new median, or the record's share breakdown goes
    # silently stale for exactly the folded key
    floor = target.get("stream_floor_sec", -1)
    if isinstance(target.get("stream_share"), dict) and floor >= 0:
        for k in keys:
            if k in target["stream_share"]:
                target["stream_share"][k] = round(max(0.0, target["queries"][k] - floor), 3)
    healed = sorted(set(target.get("healed", [])) | set(keys))
    target["healed"] = healed
    with open(target_p, "w") as f:
        # compact separators: Bench's BENCH_LOCAL record guard matches
        # the literal '"sf":<value>' (no space) — default json.dumps
        # spacing would silently divert the next full-suite record
        f.write(json.dumps(target, separators=(",", ":")) + "\n")
    print(f"{target_p}: folded {keys}; total={target['value']}")


if __name__ == "__main__":
    main()
