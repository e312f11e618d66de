"""Host scaling-envelope probe for BENCH/BASELINE.md.

Measures how this box itself scales with pinned parallelism for the two
resource classes the flagship job mixes:

* ``alu``    — pure compute (integer splitmix64 stream, fits in L1);
* ``memcpy`` — pure memory bandwidth (copy of a buffer far larger than
  LLC).

Each level forks ``cores`` worker processes, pins each to its own core
(sched_setaffinity), runs the kernel for a fixed wall budget, and sums
iterations. Efficiency column = (ops/s at this level / ops/s at 1 core)
/ cores. The probe justifies WHICH (N, 4N) pair of parallelism levels
is a fair stand-in for an N- vs 4N-machine cluster: a pair where the
HOST still scales ~linearly for both resource classes. A real 4x
cluster multiplies memory bandwidth 4x along with cores; a single box
does not — measuring a bandwidth-heavy job across a bandwidth-saturated
pair would measure the hypervisor, not the engine.

Usage: python tools/hw_probe.py [--levels 1,2,4,8,16] [--secs 3]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import time

import numpy as np


def _alu_worker(core: int, secs: float, out):
    os.sched_setaffinity(0, {core})
    x = np.arange(1 << 14, dtype=np.uint64)
    iters = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < secs:
        # splitmix64-ish mix: multiply/xor/shift on an L1-resident vector
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = z ^ (z >> np.uint64(31))
        iters += 1
    out.put(iters)


def _memcpy_worker(core: int, secs: float, out):
    os.sched_setaffinity(0, {core})
    src = np.random.default_rng(core).bytes(256 << 20)  # 256 MiB >> LLC
    src = np.frombuffer(src, dtype=np.uint8)
    dst = np.empty_like(src)
    iters = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < secs:
        np.copyto(dst, src)
        iters += 1
    out.put(iters)


KERNELS = {"alu": _alu_worker, "memcpy": _memcpy_worker}


def run_level(kernel: str, cores: int, secs: float) -> float:
    ctx = mp.get_context("fork")
    out = ctx.Queue()
    procs = [
        ctx.Process(target=KERNELS[kernel], args=(c, secs, out))
        for c in range(cores)
    ]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    total = sum(out.get() for _ in procs)
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    return total / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,2,4,8,16")
    ap.add_argument("--secs", type=float, default=3.0)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    for kernel in ("alu", "memcpy"):
        base = None
        print(f"\n{kernel}:")
        print(f"{'cores':>6} {'ops/s':>14} {'eff_vs_1':>9}")
        for lv in levels:
            best = max(
                run_level(kernel, lv, args.secs) for _ in range(args.repeats)
            )
            if base is None:
                base = best / lv
            print(f"{lv:>6} {best:>14.1f} {best / (base * lv):>9.3f}")


if __name__ == "__main__":
    main()
