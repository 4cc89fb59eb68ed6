#!/usr/bin/env python3
"""Re-pin per-query baseline rows from fresh-JVM partial bench runs.

Usage: repin_baseline.py <note> <partial.json> [<partial2.json> ...]

Each input is a Bench sidecar (tools/bench_partial_latest.json saved
under another name, or any full artifact). For every query present in
ALL inputs, the baseline row becomes min over the inputs' headline
walls — the same min-of-N fresh-JVM standard the r12 full re-pin used.
Queries not present in every input are left untouched (a one-run pin
would encode one JVM's mood). The note is appended to the baseline's
`source` provenance string.
"""
import json
import sys


def main() -> int:
    note, paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p))["queries"] for p in paths]
    common = set(runs[0])
    for r in runs[1:]:
        common &= set(r)
    base_path = f"{sys.path[0]}/bench_baseline.json"
    base = json.load(open(base_path))
    changed = []
    for name in sorted(common):
        vals = [r[name] for r in runs if r[name] is not None]
        if len(vals) != len(runs):
            continue
        new = min(vals)
        old = base["queries"].get(name)
        base["queries"][name] = round(new, 3)
        changed.append(f"{name}: {old} -> {new:.3f}")
    base["source"] += f" {note}"
    json.dump(base, open(base_path, "w"), indent=1, sort_keys=True)
    print("\n".join(changed))
    print(f"re-pinned {len(changed)} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
