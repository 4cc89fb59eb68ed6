#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares a fresh Bench JSON line against the frozen per-query baseline
(tools/bench_baseline.json, recorded from BENCH_r02 — the first round on
the honest toRdd.count sink) and FAILS on any >2x per-query regression.

Usage:
    # from a file holding the bench output (raw line or sbt log):
    python3 tools/check_bench.py /tmp/bench.txt
    # or pipe:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
        | python3 tools/check_bench.py -

Queries absent from the baseline (added after r02) are reported as NEW and
never fail the gate; a floor of 0.5 s absorbs scheduler jitter on
sub-second queries (a 0.2 s -> 0.45 s wobble is noise, not a regression).
Exit code 1 iff any query regresses.
"""
import json
import re
import sys

THRESHOLD = 2.0
FLOOR_SEC = 0.5


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "-"
    text = sys.stdin.read() if src == "-" else open(src).read()
    m = None
    for m in re.finditer(r'\{"metric".*\}', text):
        pass  # keep the LAST bench line in the input
    if m is None:
        print("check_bench: no bench JSON line found in input", file=sys.stderr)
        return 2
    bench = json.loads(m.group(0))
    if "queries" not in bench and bench.get("sidecar"):
        # the stdout line is the short form (totals + slowest only, sized
        # to survive tail-clipped captures); the full per-query map lives
        # in the repo-anchored sidecar Bench writes alongside it
        import os
        side = os.path.join(os.path.dirname(sys.path[0] or "."),
                            bench["sidecar"])
        bench = json.loads(open(side).read())
    base = json.load(open(f"{sys.path[0]}/bench_baseline.json"))
    baseline = base["queries"]

    regressions, improved, new = [], 0, []
    for name, sec in sorted(bench["queries"].items()):
        if sec is None:
            # failed query: reported separately via bench["failed"]
            continue
        if name not in baseline:
            new.append(name)
            continue
        b = baseline[name]
        if sec > max(b * THRESHOLD, FLOOR_SEC):
            regressions.append((name, b, sec))
        elif sec < b:
            improved += 1

    print(f"baseline: {base['source']}")
    print(f"{len(bench['queries'])} queries: {improved} faster than baseline, "
          f"{len(new)} new ({', '.join(new) if new else '-'}), "
          f"{len(regressions)} regressed")
    # adjudicate each wall regression against the per-pass [wall, cpu]
    # pairs Bench emits: host contention inflates wall while process-CPU
    # stays at the quiet level (the work is unchanged, just scheduled
    # late), a plan regression inflates both. Three rounds of manual
    # forensics (r5 q_date_parts, r6-r7 q_semdedup) are what this
    # automates — see VERDICT r7 "what's missing" item 3.
    passes = bench.get("passes", {})
    for name, b, sec in regressions:
        verdict = ""
        ps = passes.get(name) or []
        walls = [p[0] for p in ps if p]
        cpus = [p[1] for p in ps if p and len(p) > 1]
        if walls and cpus:
            # min-CPU pass ~ the query's real work; if the min-WALL pass
            # cost >2x its own cpu AND another pass ran the same cpu in
            # much less wall, the host was contended
            if min(walls) > 2 * min(cpus) and max(walls) / min(walls) > 1.5:
                verdict = "  [pass variance + wall>>cpu: likely host contention]"
            elif len(walls) > 1 and max(walls) / min(walls) > 2:
                verdict = "  [high pass variance: rerun on a quiet host]"
        print(f"  REGRESSION {name}: {b:.2f}s -> {sec:.2f}s "
              f"({sec / b:.1f}x, limit {THRESHOLD}x){verdict}")
    if bench.get("failed"):
        print(f"  FAILED queries in bench run: {bench['failed']}")
        return 1
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
