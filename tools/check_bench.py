#!/usr/bin/env python3
"""Per-query bench regression gate, noise-robust.

Compares a fresh Bench JSON line against the frozen per-query baseline
(tools/bench_baseline.json, recorded from BENCH_r02 — the first round on
the honest toRdd.count sink) and FAILS on any >2x per-query regression
THAT SURVIVES ADJUDICATION.

Two rounds of history motivate the adjudication step: identical code
flipped this gate red on JVM/host noise twice (r9: the committed
artifact; r10: the driver's worktree rerun — 4 queries at 2.7-3.9x whose
same-day sibling run read baseline speed). A single-JVM 140+-query
battery on a shared host has per-query noise that a raw 2x rule
relitigates every round. The gate now adjudicates the way the manual
forensics always did:

1. In-artifact: the per-pass [wall, cpu] arrays Bench emits separate
   host contention (wall inflated, cpu at the quiet level — the work is
   unchanged, just scheduled late) from plan regressions (both inflate).
   This only ANNOTATES — it never clears a query by itself.
2. Fresh-JVM rerun (the decisive step): every flagged query is re-run
   once in a clean JVM via SPARK_GRAFT_BENCH_ONLY (writes
   tools/bench_partial_latest.json, never the canonical artifact), and
   the gate re-applies the 2x rule to min(original, clean-JVM) — the
   same clean-JVM adjudication standard SCALING.md documents for the
   x100 fleet probes. A query that is fast in a fresh JVM on identical
   code was never a plan regression. A query still >2x in a clean JVM
   is REAL and fails the gate.

Usage:
    python3 tools/check_bench.py /path/to/bench.json      # full gate
    python3 tools/check_bench.py --no-rerun /path/to/...  # artifact-only
    ... | python3 tools/check_bench.py -                  # pipe (sbt log ok)

--no-rerun (or an environment without sbt / a failed rerun) keeps every
flagged query flagged — adjudication can only happen by actually
re-measuring, never by assuming noise.

Queries absent from the baseline (added after r02) are reported as NEW and
never fail the gate. Two floors absorb scheduler jitter on sub-second
queries: an absolute floor of 0.5 s (a 0.2 s -> 0.45 s wobble is noise)
AND an absolute-delta floor — a query only flags when it exceeds BOTH
2x its baseline and baseline + 0.5 s. Rationale (r13): twice in one
round the closing gate flagged a different sub-second query on host
drift, each costing a worktree adjudication; a 0.3 s -> 0.65 s "2.2x"
is 350 ms of scheduler mood, not a plan regression. The 2x contract
for non-trivial (>= 0.5 s) queries is unchanged: for b >= DELTA_FLOOR,
b * 2 >= b + DELTA_FLOOR, so the delta floor never loosens them.
Exit code 1 iff any query regresses after adjudication.
"""
import json
import os
import re
import subprocess
import sys

THRESHOLD = 2.0
FLOOR_SEC = 0.5
DELTA_FLOOR_SEC = 0.5
RERUN_TIMEOUT_SEC = 1800


def limit(b):
    return max(b * THRESHOLD, b + DELTA_FLOOR_SEC, FLOOR_SEC)


def parse_bench(text, tools_dir):
    m = None
    for m in re.finditer(r'\{"metric".*\}', text):
        pass  # keep the LAST bench line in the input
    if m is None:
        return None
    bench = json.loads(m.group(0))
    if "queries" not in bench and bench.get("sidecar"):
        # the stdout line is the short form (totals + slowest only, sized
        # to survive tail-clipped captures); the full per-query map lives
        # in the repo-anchored sidecar Bench writes alongside it
        side = os.path.join(os.path.dirname(tools_dir), bench["sidecar"])
        bench = json.loads(open(side).read())
    return bench


def heuristic_note(passes, name):
    """Annotate (never clear) from the per-pass [wall, cpu] arrays."""
    ps = passes.get(name) or []
    walls = [p[0] for p in ps if p]
    cpus = [p[1] for p in ps if p and len(p) > 1]
    if walls and cpus:
        # min-CPU pass ~ the query's real work; if the min-WALL pass
        # cost >2x its own cpu AND another pass ran the same cpu in
        # much less wall, the host was contended
        if min(walls) > 2 * min(cpus) and max(walls) / min(walls) > 1.5:
            return "  [pass variance + wall>>cpu: likely host contention]"
        if len(walls) > 1 and max(walls) / min(walls) > 2:
            return "  [high pass variance: rerun on a quiet host]"
    return ""


def clean_jvm_rerun(names, sf_dir, tools_dir):
    """Re-measure `names` in a fresh JVM; return {name: min_wall} or None.

    Runs Bench with SPARK_GRAFT_BENCH_ONLY from the repo root (the
    directory holding tools/) — that path writes
    tools/bench_partial_latest.json and never touches the canonical
    full artifact.
    """
    repo = os.path.dirname(os.path.abspath(tools_dir)) or "."
    partial = os.path.join(tools_dir, "bench_partial_latest.json")
    try:
        if os.path.exists(partial):
            os.remove(partial)
        env = dict(os.environ,
                   SPARK_GRAFT_BENCH_ONLY=",".join(sorted(names)),
                   SPARK_GRAFT_SF_DIR=sf_dir)
        print(f"adjudicating {len(names)} flagged quer"
              f"{'y' if len(names) == 1 else 'ies'} in a fresh JVM "
              f"(sbt runMain graft.Bench, SPARK_GRAFT_BENCH_ONLY)...",
              flush=True)
        r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                           cwd=repo, env=env, timeout=RERUN_TIMEOUT_SEC,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
        if r.returncode != 0:
            print(f"  rerun FAILED (sbt exit {r.returncode}) — "
                  "flags stand unadjudicated", flush=True)
            return None
        return json.loads(open(partial).read())["queries"]
    except Exception as e:
        print(f"  rerun FAILED ({type(e).__name__}: {e}) — "
              "flags stand unadjudicated", flush=True)
        return None


def main() -> int:
    args = [a for a in sys.argv[1:]]
    do_rerun = True
    if "--no-rerun" in args:
        do_rerun = False
        args.remove("--no-rerun")
    src = args[0] if args else "-"
    text = sys.stdin.read() if src == "-" else open(src).read()
    tools_dir = sys.path[0] or "."
    bench = parse_bench(text, tools_dir)
    if bench is None:
        print("check_bench: no bench JSON line found in input",
              file=sys.stderr)
        return 2
    base = json.load(open(f"{tools_dir}/bench_baseline.json"))
    baseline = base["queries"]

    flagged, improved, new = [], 0, []
    for name, sec in sorted(bench["queries"].items()):
        if sec is None:
            # failed query: reported separately via bench["failed"]
            continue
        if name not in baseline:
            new.append(name)
            continue
        b = baseline[name]
        if sec > limit(b):
            flagged.append((name, b, sec))
        elif sec < b:
            improved += 1

    print(f"baseline: {base['source']}")
    print(f"{len(bench['queries'])} queries: {improved} faster than baseline, "
          f"{len(new)} new ({', '.join(new) if new else '-'}), "
          f"{len(flagged)} flagged >={THRESHOLD}x")
    passes = bench.get("passes", {})

    clean = None
    if flagged and do_rerun:
        clean = clean_jvm_rerun([n for n, _, _ in flagged],
                                bench.get("sf", "/root/testdata/sf0.1"),
                                tools_dir)

    regressions = []
    for name, b, sec in flagged:
        note = heuristic_note(passes, name)
        cj = clean.get(name) if clean else None
        adj = min(sec, cj) if cj is not None else sec
        if cj is not None and adj <= limit(b):
            print(f"  cleared    {name}: {b:.2f}s -> {sec:.2f}s in artifact, "
                  f"{cj:.2f}s in fresh JVM (noise, not plan){note}")
            continue
        confirm = (f"  [CONFIRMED in fresh JVM: {cj:.2f}s]"
                   if cj is not None else
                   "  [unadjudicated: no clean-JVM sample]")
        print(f"  REGRESSION {name}: {b:.2f}s -> {adj:.2f}s "
              f"({adj / b:.1f}x, limit {THRESHOLD}x){confirm}{note}")
        regressions.append(name)
    if bench.get("failed"):
        print(f"  FAILED queries in bench run: {bench['failed']}")
        return 1
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
