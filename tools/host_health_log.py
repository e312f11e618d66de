"""Session-long host-health logger for quiet-window bench promotion.

Appends one JSON line every INTERVAL seconds to BENCH/host_health_r5.jsonl:
{ts, membw_ms, steal_frac, loadavg1}. The round-5 task (VERDICT r4 "What's
wrong" #2/#3) requires either a verified-quiet flagship scaling pair
(membw < 40 ms, steal ~ 0) or an explicit host-health log proving the
window never opened. This file is that log: it runs for the whole session
alongside the work, so the committed artifact is self-describing either
way, and the best observed window tells us WHEN to run the headline bench
sample worth promoting.

Usage: python tools/host_health_log.py [--interval 120] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def membw_probe_ms() -> float:
    # Same normalized probe as bench.py:_membw_probe_ms (400 MB ref size).
    n = 50_000_000
    try:
        with open("/proc/meminfo") as f:
            mem = {ln.split(":")[0]: int(ln.split()[1]) for ln in f if ":" in ln}
        avail_b = mem.get("MemAvailable", 1 << 62) * 1024
        n = int(min(n, max(1_000_000, avail_b // 64)))
    except (OSError, ValueError):
        pass
    a = np.ones(n)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        a.sum()
        best = min(best, time.perf_counter() - t0)
    del a
    return round(best * 1000 * (50_000_000 / n), 1)


def cpu_steal():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=120.0)
    ap.add_argument("--out", default="BENCH/host_health_r5.jsonl")
    args = ap.parse_args()
    s0, t0 = cpu_steal()
    while True:
        time.sleep(args.interval)
        s1, t1 = cpu_steal()
        steal = (s1 - s0) / max(t1 - t0, 1.0)
        s0, t0 = s1, t1
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        rec = {
            "ts": round(time.time(), 1),
            "iso": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "membw_ms": membw_probe_ms(),
            "steal_frac": round(steal, 5),
            "loadavg1": load1,
        }
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
