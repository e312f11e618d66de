"""Within-stage isolation for build_features — which sub-plan burns the
time at a given core count?

Variants (all full-materialization noop writes on the same cached e0):
  cache_scan   — one pass over the persisted entity frame
  keyed        — + validity/_pkey/_adj_sorted/_pkh projection
  windowed     — + the dedup/gate window exchange + sort
  adj_only     — the aux scatter-gather adjacency aggregation alone
  no_adj       — windowed + final projection, adjacency join stubbed
  full         — build_features as shipped

Usage: python tools/feature_stage_probe.py [--docs 10000000] [--cores 16]
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
from pyspark.sql import functions as F, Window
from pyspark.storagelevel import StorageLevel
from asag_spark.session import get_spark
from asag_spark.extract import extract_entities
from asag_spark.operators.filters import validity_predicate, validity_filter
from asag_spark.operators.enrich import (
    build_features, adjacent_sites_sorted, adjacency_final_types_from_aux,
    own_stop_type)

heap_gb = max(4, round(1.75 * {cores}))
os.environ["ASAG_DRIVER_MEM"] = f"{{heap_gb}}g"
os.makedirs("/dev/shm/spark-local", exist_ok=True)
spark = get_spark("fsprobe", master="local[{cores}]",
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
AS_OF = "2019-01-01T00:00:00"

e0 = extract_entities(docs, spans_through=False).persist(
    StorageLevel.MEMORY_AND_DISK)
e0.write.format("noop").mode("overwrite").save()  # populate cache

et = F.col("entity_type")
keyed = e0.select(
    "*",
    validity_predicate(AS_OF).alias("_valid"),
    F.coalesce(F.col("props")["parentDocId"], F.col("doc_id")).alias("_pkey"),
    adjacent_sites_sorted(F.col("props")).alias("_adj_sorted"),
).withColumn("_pkh", F.xxhash64("_pkey"))

w_sorted = Window.partitionBy("_pkh", "_pkey").orderBy(
    "id", "version", F.col("_valid").desc())
e = keyed.withColumn(
    "_is_first",
    F.lag("id").over(w_sorted).isNull()
    | (F.lag("id").over(w_sorted) != F.col("id"))
    | (F.lag("version").over(w_sorted) != F.col("version")),
)
gated = e.withColumn(
    "_parent_ok",
    F.max(F.when((et == "StopPlace") & F.col("geom_wkt").isNotNull()
                 & F.col("_valid"), 1).otherwise(0)
          ).over(Window.partitionBy("_pkh", "_pkey")),
).filter(F.col("_valid") & F.col("_is_first"))

stops_aux = validity_filter(e0, AS_OF).filter(
    (et == "StopPlace") & F.col("geom_wkt").isNotNull()
).select("doc_id", "id",
         own_stop_type(F.col("props")).alias("own_type"),
         adjacent_sites_sorted(F.col("props")).alias("adj_sorted"))
adj = adjacency_final_types_from_aux(stops_aux)

full = build_features(docs, as_of=AS_OF)

variants = [
    ("cache_scan", e0),
    ("keyed", keyed),
    ("windowed", gated),
    ("adj_only", adj),
    ("full", full),
]

def noop(df):
    df.write.format("noop").mode("overwrite").save()

walls = {{}}
for name, df in variants:
    noop(df)  # warm
    best = 1e18
    for _ in range({repeats}):
        t0 = time.perf_counter(); noop(df)
        best = min(best, time.perf_counter() - t0)
    walls[name] = round(best, 3)

print("RESULT " + json.dumps({{"cores": {cores}, "walls": walls}}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10000000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    docs_path = f"/tmp/asag_bench/docs_{args.docs}"
    assert os.path.exists(os.path.join(docs_path, "_SUCCESS")), docs_path

    code = SNIPPET.format(repo=REPO, cores=args.cores, docs_path=docs_path,
                          repeats=args.repeats)
    env = dict(os.environ, PYTHONPATH=REPO, OPENBLAS_NUM_THREADS="1",
               OMP_NUM_THREADS="1")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line)
            return
    raise RuntimeError(f"no RESULT:\n{out.stderr[-3000:]}")


if __name__ == "__main__":
    main()
