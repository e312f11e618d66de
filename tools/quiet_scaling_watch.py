"""Opportunistic quiet-window scaling runner (VERDICT r04 #2/#3).

Polls the host membw probe; when it reads inside the quiet band
(< 40 ms normalized) it immediately runs the pinned scaling ladder at
both pairs (4→16 and 2→8), appending each result — annotated with the
membw reading at launch and finish — to BENCH/scaling_raw_r5.jsonl,
then exits. If the window never opens before --deadline-min, exits
leaving only probe records, which together with
BENCH/host_health_r5.jsonl is the explicit host-health log the task
requires when the host never quiets.

Usage: python tools/quiet_scaling_watch.py [--gate-ms 40]
       [--poll-s 240] [--deadline-min 240] [--docs 10000000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from host_health_log import membw_probe_ms  # noqa: E402


def append(path: str, rec: dict) -> None:
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate-ms", type=float, default=40.0)
    ap.add_argument("--poll-s", type=float, default=240.0)
    ap.add_argument("--deadline-min", type=float, default=240.0)
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--out", default="BENCH/scaling_raw_r5.jsonl")
    args = ap.parse_args()
    out = os.path.join(REPO, args.out)
    t0 = time.time()
    while True:
        mb = membw_probe_ms()
        append(out, {"kind": "probe", "iso": time.strftime("%FT%T"),
                     "membw_ms": mb})
        if mb < args.gate_ms:
            for small, big in ((4, 16), (2, 8)):
                mb_start = membw_probe_ms()
                t_run = time.time()
                p = subprocess.run(
                    [sys.executable, os.path.join(REPO, "tools", "bench_scaling.py"),
                     "--docs", str(args.docs), "--small", str(small),
                     "--big", str(big), "--repeats", "3"],
                    capture_output=True, text=True, cwd=REPO,
                )
                levels = [json.loads(ln) for ln in p.stdout.splitlines()
                          if ln.startswith("{")]
                append(out, {
                    "kind": "ladder", "iso": time.strftime("%FT%T"),
                    "pair": [small, big],
                    "membw_ms_start": mb_start,
                    "membw_ms_end": membw_probe_ms(),
                    "wall_s": round(time.time() - t_run, 1),
                    "rc": p.returncode,
                    "levels": levels,
                    "eff": (
                        round(levels[1]["docs_per_sec"]
                              / levels[0]["docs_per_sec"] / (big / small), 3)
                        if len(levels) >= 2 else None
                    ),
                    "stderr_tail": p.stderr[-400:] if p.returncode else "",
                })
            return
        if (time.time() - t0) / 60.0 > args.deadline_min:
            append(out, {"kind": "deadline", "iso": time.strftime("%FT%T"),
                         "note": "window never opened"})
            return
        time.sleep(args.poll_s)


if __name__ == "__main__":
    main()
