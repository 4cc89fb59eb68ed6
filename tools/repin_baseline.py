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

Rows where the new pin is SLOWER than the recorded baseline loosen the
regression gate; they are refused unless --allow-slower is passed, and
loudly listed either way — a routine re-pin should only ever tighten.
"""
import json
import sys


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--allow-slower"]
    allow_slower = "--allow-slower" in sys.argv[1:]
    note, paths = argv[0], argv[1:]
    runs = [json.load(open(p))["queries"] for p in paths]
    common = set(runs[0])
    for r in runs[1:]:
        common &= set(r)
    base_path = f"{sys.path[0]}/bench_baseline.json"
    base = json.load(open(base_path))
    changed = []
    slower = []
    for name in sorted(common):
        vals = [r[name] for r in runs if r[name] is not None]
        if len(vals) != len(runs):
            continue
        new = min(vals)
        old = base["queries"].get(name)
        if old is not None and new > old:
            slower.append(f"{name}: {old} -> {new:.3f} (SLOWER)")
            if not allow_slower:
                continue
        base["queries"][name] = round(new, 3)
        changed.append(f"{name}: {old} -> {new:.3f}")
    base["source"] += f" {note}"
    json.dump(base, open(base_path, "w"), indent=1, sort_keys=True)
    print("\n".join(changed))
    print(f"re-pinned {len(changed)} rows")
    if slower:
        verb = "LOOSENED" if allow_slower else "refused (pass --allow-slower to accept)"
        print(f"WARNING: {len(slower)} row(s) slower than baseline, {verb}:",
              file=sys.stderr)
        print("\n".join(f"  {s}" for s in slower), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
