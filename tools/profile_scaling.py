"""Stage-isolating scaling profiler — which stage fails to scale N→4N?

Runs each pipeline prefix as its own timed noop-write action at two
CPU-pinned parallelism levels (same protocol as tools/bench_scaling.py)
and reports per-stage wall + incremental scaling efficiency. The stage
whose *incremental* cost scales worst is the Amdahl term to fix.

Usage: python tools/profile_scaling.py [--docs 2000000] [--small 4] [--big 16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = r"""
import json, os, sys, time
os.sched_setaffinity(0, set(range({cores})))
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from asag_spark.session import get_spark
from asag_spark.functions import assign_tiles
from asag_spark.extract import extract_entities
from asag_spark.operators.filters import validity_filter
from asag_spark.operators.enrich import build_features

# Same cluster-faithful resource scaling as tools/bench_scaling.py:
# heap and shuffle spindles scale with the level, else the 16-core
# level is GC/disk-starved and per-stage attribution is wrong.
heap_gb = max(4, round(1.75 * {cores}))
os.environ["ASAG_DRIVER_MEM"] = f"{{heap_gb}}g"
os.makedirs("/dev/shm/spark-local", exist_ok=True)
spark = get_spark("profile", master="local[{cores}]",
                  shuffle_partitions={cores},
                  extra_conf={{
                      "spark.sql.files.maxPartitionBytes": "16m",
                      "spark.local.dir": "/dev/shm/spark-local",
                      "spark.driver.extraJavaOptions":
                          "-XX:ReservedCodeCacheSize=1g "
                          "-XX:+UseCodeCacheFlushing -XX:+UseParallelGC "
                          f"-Xms{{heap_gb}}g -XX:+AlwaysPreTouch",
                  }})
docs = spark.read.parquet({docs_path!r})

def noop(df):
    df.write.format("noop").mode("overwrite").save()

AS_OF = "2019-01-01T00:00:00"
e0 = validity_filter(extract_entities(docs, spans_through=False), AS_OF)
feats = build_features(docs, as_of=AS_OF)
stages = [
    ("scan", docs),
    ("extract", extract_entities(docs, spans_through=False)),
    ("extract_filter", e0),
    ("features", feats),
    ("tiles", assign_tiles(feats)),
]

walls = {{}}
for name, df in stages:
    for _ in range({warm}):
        noop(df)
    best = 1e18
    for _ in range({repeats}):
        t0 = time.perf_counter(); noop(df)
        best = min(best, time.perf_counter() - t0)
    walls[name] = round(best, 3)

print("RESULT " + json.dumps({{"cores": {cores}, "walls": walls}}))
spark.stop()
"""


def run_level(cores: int, docs_path: str, repeats: int, warm: int) -> dict:
    code = SNIPPET.format(repo=REPO, cores=cores, docs_path=docs_path,
                          repeats=repeats, warm=warm)
    env = dict(os.environ, PYTHONPATH=REPO, OPENBLAS_NUM_THREADS="1",
               OMP_NUM_THREADS="1",
               ASAG_DRIVER_MEM=os.environ.get("ASAG_DRIVER_MEM", "20g"))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT (cores={cores}):\n{out.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000000)
    ap.add_argument("--small", type=int, default=4)
    ap.add_argument("--big", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--warm", type=int, default=2)
    args = ap.parse_args()

    docs_path = f"/tmp/asag_bench/docs_{args.docs}"
    assert os.path.exists(os.path.join(docs_path, "_SUCCESS")), docs_path

    res = {}
    for cores in (args.small, args.big):
        res[cores] = run_level(cores, docs_path, args.repeats, args.warm)
        print(json.dumps(res[cores]))

    s, b = res[args.small]["walls"], res[args.big]["walls"]
    ratio = args.big / args.small
    names = list(s)
    print(f"\n{'stage':<16}{'w@'+str(args.small):>9}{'w@'+str(args.big):>9}"
          f"{'cum_eff':>9}{'inc@s':>8}{'inc@b':>8}{'inc_eff':>9}")
    prev_s = prev_b = 0.0
    for n in names:
        cum_eff = (s[n] / b[n]) / ratio if b[n] else 0
        inc_s, inc_b = s[n] - prev_s, b[n] - prev_b
        inc_eff = (inc_s / inc_b) / ratio if inc_b > 0 else float("nan")
        print(f"{n:<16}{s[n]:>9.2f}{b[n]:>9.2f}{cum_eff:>9.2f}"
              f"{inc_s:>8.2f}{inc_b:>8.2f}{inc_eff:>9.2f}")
        prev_s, prev_b = s[n], b[n]


if __name__ == "__main__":
    main()
