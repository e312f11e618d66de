"""Cross-run per-query minima harness (the r3 practice, now a tool).

Runs `bench.py` as a subprocess N times, appends each JSON line to
BENCH/bench_raw_r{round}.jsonl, and regenerates
BENCH/minima_r{round}.md — the per-query min-over-runs table with the
run's steal/membw annotations. Min-over-runs is the standard
unbiased-under-noise estimator on this shared guest (multi-minute
steal bursts + neighbor memory-bandwidth contention inflate identical
actions 2-6x; see BENCH/BASELINE.md). bench.py's own quiet-window
gate (ASAG_BENCH_QUIET_MS) makes each sample wait for a clean host
window when one opens within its budget, and every line carries
host_membw_ms_start / steal_at_min so polluted samples stay
self-describing.

Usage: python tools/bench_minima.py [--runs 3] [--round 4]
       [--report-only]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(raw_path: str) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600, cwd=REPO,
    )
    line = None
    for ln in out.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{") and '"queries"' in ln:
            line = ln
    if line is None:
        raise RuntimeError(f"bench.py emitted no JSON line:\n"
                           f"{out.stdout[-1000:]}\n{out.stderr[-2000:]}")
    with open(raw_path, "a") as f:
        f.write(line + "\n")
    return json.loads(line)


def report(raw_path: str, md_path: str, rnd: int) -> None:
    runs = []
    with open(raw_path) as f:
        for ln in f:
            ln = ln.strip()
            if ln:
                runs.append(json.loads(ln))
    minima: dict[str, tuple[float, int]] = {}
    for i, r in enumerate(runs, 1):
        for q, sec in r.get("queries", {}).items():
            if q not in minima or sec < minima[q][0]:
                minima[q] = (sec, i)
    rows = sorted(minima.items(), key=lambda kv: -kv[1][0])

    def extra(r, key):
        return r.get("extras", {}).get(key, r.get(key))

    membw = [extra(r, "host_membw_ms_start") for r in runs]
    degraded = [extra(r, "host_degraded") for r in runs]
    lines = [
        f"# Round-{rnd} cross-run per-query minima (bench_raw_r{rnd}.jsonl)",
        "",
        f"{len(runs)} recorded runs. Min-over-runs is the standard",
        "unbiased-under-noise estimator on this shared guest (see",
        "BENCH/BASELINE.md); each run carries per-query steal_at_min, the",
        "host memory-bandwidth probe (host_membw_ms_start, quiet band",
        "< 40 ms) and — new in r4 — bench.py's quiet-window gate fields",
        "(quiet_gate_waited_s / host_degraded), so a polluted sample is",
        "self-describing at the artifact level, not just per query.",
        "",
        f"Per-run membw (ms): {membw}",
        f"Per-run host_degraded: {degraded}",
        "",
        "| query | min (s) | run # |",
        "|---|---|---|",
    ]
    for q, (sec, run_i) in rows:
        lines.append(f"| {q} | {sec} | {run_i} |")
    sum_min = round(sum(sec for _, (sec, _) in rows), 3)
    lines += ["", f"Sum of per-query minima: **{sum_min} s**.", ""]
    with open(md_path, "w") as f:
        f.write("\n".join(lines))
    print(f"{len(runs)} runs, {len(rows)} queries -> {md_path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--round", type=int, default=4, dest="rnd")
    ap.add_argument("--report-only", action="store_true")
    args = ap.parse_args()
    raw = os.path.join(REPO, "BENCH", f"bench_raw_r{args.rnd}.jsonl")
    md = os.path.join(REPO, "BENCH", f"minima_r{args.rnd}.md")
    if not args.report_only:
        for i in range(args.runs):
            r = run_once(raw)
            ex = r.get("extras", {})
            print(f"run {i + 1}/{args.runs}: wall={r.get('value')} "
                  f"membw={ex.get('host_membw_ms_start')} "
                  f"degraded={ex.get('host_degraded')}")
    report(raw, md, args.rnd)


if __name__ == "__main__":
    main()
