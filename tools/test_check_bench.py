#!/usr/bin/env python3
"""Self-test for check_bench.py's gate logic (no Spark, no sbt).

Covers the pure decision paths: clean artifact -> exit 0; flagged
artifact without adjudication (--no-rerun) -> exit 1; failed query ->
exit 1; sub-floor wobble ignored; NEW queries never fail. The
fresh-JVM rerun path is exercised against the real engine in-round
(it shells out to sbt), so here it is covered only via --no-rerun's
"flags stand" behavior.

Run: python3 tools/test_check_bench.py   (exit 0 = all pass)
"""
import json
import os
import subprocess
import sys
import tempfile

TOOLS = os.path.dirname(os.path.abspath(__file__))


def run(artifact, *flags):
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        f.write(json.dumps(artifact))
        path = f.name
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(TOOLS, "check_bench.py"),
             *flags, path],
            capture_output=True, text=True)
        return r.returncode, r.stdout
    finally:
        os.unlink(path)


def main() -> int:
    base = json.load(open(os.path.join(TOOLS, "bench_baseline.json")))
    b = base["queries"]
    name0 = sorted(b)[0]

    def artifact(queries, failed=None):
        return {"metric": "total", "value": 1.0, "unit": "sec",
                "queries": queries, "passes": {}, "failed": failed or {},
                "sf": "/root/testdata/sf0.1"}

    failures = []

    def check(label, cond):
        print(("PASS " if cond else "FAIL ") + label)
        if not cond:
            failures.append(label)

    # 1. at-baseline run passes
    rc, _ = run(artifact({q: s for q, s in b.items()}), "--no-rerun")
    check("clean artifact exits 0", rc == 0)

    # 2. a >2x regression (above the floor) fails without adjudication
    q2 = dict(b)
    q2[name0] = max(b[name0] * 3, 1.0)
    rc, out = run(artifact(q2), "--no-rerun")
    check("unadjudicated 3x regression exits 1",
          rc == 1 and f"REGRESSION {name0}" in out)

    # 3. sub-floor wobble is ignored (0.1 s -> 0.4 s is under FLOOR_SEC)
    q3 = dict(b)
    q3[name0] = 0.4 if b[name0] < 0.2 else b[name0]
    rc, _ = run(artifact(q3), "--no-rerun")
    check("sub-floor wobble exits 0", rc == 0 or b[name0] >= 0.2)

    # 4. a failed query fails the gate even with all timings clean
    rc, out = run(artifact(dict(b), failed={"q_x": "boom"}), "--no-rerun")
    check("failed query exits 1", rc == 1 and "FAILED queries" in out)

    # 5. queries not in the baseline are NEW, never regressions
    q5 = dict(b)
    q5["q_brand_new"] = 99.0
    rc, out = run(artifact(q5), "--no-rerun")
    check("unknown query is NEW not a regression",
          rc == 0 and "q_brand_new" in out)

    # 6. null timing (crashed pass) is skipped, not treated as 0 s
    q6 = dict(b)
    q6[name0] = None
    rc, _ = run(artifact(q6), "--no-rerun")
    check("null timing skipped", rc == 0)

    # 7. delta floor: a sub-second row past 2x but under baseline+0.5s
    # is host drift, not a regression (r13: two such flags, both noise).
    # Use a synthetic sub-second baseline row via the smallest real one.
    small = min(b, key=b.get)
    q7 = dict(b)
    q7[small] = b[small] * 2.2  # >2x ...
    if q7[small] < b[small] + 0.5:  # ... but under the delta floor
        rc, out = run(artifact(q7), "--no-rerun")
        check("2.2x under delta floor exits 0",
              rc == 0 and "REGRESSION" not in out)
    else:
        check("2.2x under delta floor exits 0 (no sub-second row; vacuous)",
              True)

    # 8. delta floor does NOT shelter big rows: 2.2x on a >=0.5s baseline
    # still regresses (delta there exceeds 0.5 s by construction)
    big = max(b, key=b.get)
    q8 = dict(b)
    q8[big] = b[big] * 2.2
    rc, out = run(artifact(q8), "--no-rerun")
    check("2.2x on a large row still exits 1",
          rc == 1 and f"REGRESSION {big}" in out)

    print(f"{8 - len(failures)}/8 pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
