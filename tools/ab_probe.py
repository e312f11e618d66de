"""Interleaved A/B probe for build_features sub-plans at one core count.

Variants run round-robin in ONE JVM (same steal regime — this host has
bursty multi-minute hypervisor-steal windows, so sequential per-variant
timing confounds variant with weather). Per timed action we also record
the steal fraction on the pinned cores from /proc/stat, so a
steal-polluted min is visible.

Variants:
  w_full    — shipped dedup/gate window (full props struct through the
              exchange)
  w_pruned  — same window, props pruned of fields whose derived values
              already ride separately (validFrom/validTo/adjacentSites/
              parentDocId)
  w_thin    — window over thin columns only (lower bound: exchange+sort
              machinery without the payload)
  adj_sg    — shipped scatter-gather adjacency (type-row per stop
              through the exchange)
  adj_bp    — broadcast-prune adjacency (distinct refs broadcast →
              semi-join the cached stop side → broadcast resolved types)

Usage: python tools/ab_probe.py [--docs 10000000] [--cores 16] [--rounds 3]
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
CORES = {cores}
os.sched_setaffinity(0, set(range(CORES)))
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F, Window
from pyspark.storagelevel import StorageLevel
from asag_spark.session import get_spark
from asag_spark.extract import extract_entities
from asag_spark.operators.filters import validity_predicate, validity_filter
from asag_spark.operators.enrich import (
    adjacent_sites_sorted, adjacency_final_types_from_aux, own_stop_type)
from asag_spark.schema import ENTITY_PROP_KEYS

heap_gb = max(4, round(1.75 * CORES))
os.environ["ASAG_DRIVER_MEM"] = f"{{heap_gb}}g"
os.makedirs("/dev/shm/spark-local", exist_ok=True)
spark = get_spark("abprobe", master="local[{cores}]",
                  shuffle_partitions=CORES,
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

def steal_jiffies():
    tot = 0
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("cpu") and not line.startswith("cpu "):
                n = int(line[3:line.index(" ")])
                if n < CORES:
                    tot += int(line.split()[8])
    return tot

e0 = extract_entities(docs, spans_through=False).persist(
    StorageLevel.MEMORY_AND_DISK)
e0.write.format("noop").mode("overwrite").save()

et = F.col("entity_type")

def keyed_frame(prune_props: bool):
    if prune_props:
        drop = {{"validFrom", "validTo", "adjacentSites", "parentDocId"}}
        keep = [k for k in ENTITY_PROP_KEYS if k not in drop]
        props_out = F.struct(
            *[F.col("props")[k].alias(k) for k in keep]).alias("props")
    else:
        props_out = F.col("props")
    return e0.select(
        "doc_id", "entity_type", "id", "version", props_out, "geom_wkt",
        validity_predicate(AS_OF).alias("_valid"),
        F.coalesce(F.col("props")["parentDocId"], F.col("doc_id")).alias("_pkey"),
        adjacent_sites_sorted(F.col("props")).alias("_adj_sorted"),
    ).withColumn("_pkh", F.xxhash64("_pkey"))

def windowed(keyed):
    w_sorted = Window.partitionBy("_pkh", "_pkey").orderBy(
        "id", "version", F.col("_valid").desc())
    e = keyed.withColumn(
        "_is_first",
        F.lag("id").over(w_sorted).isNull()
        | (F.lag("id").over(w_sorted) != F.col("id"))
        | (F.lag("version").over(w_sorted) != F.col("version")),
    )
    return e.withColumn(
        "_parent_ok",
        F.max(F.when((et == "StopPlace") & F.col("geom_wkt").isNotNull()
                     & F.col("_valid"), 1).otherwise(0)
              ).over(Window.partitionBy("_pkh", "_pkey")),
    ).filter(F.col("_valid") & F.col("_is_first"))

thin = e0.select(
    "doc_id", "id", "version", "entity_type",
    F.col("geom_wkt").isNotNull().alias("_geom_ok"),
    validity_predicate(AS_OF).alias("_valid"),
    F.coalesce(F.col("props")["parentDocId"], F.col("doc_id")).alias("_pkey"),
).withColumn("_pkh", F.xxhash64("_pkey"))
w_sorted_t = Window.partitionBy("_pkh", "_pkey").orderBy(
    "id", "version", F.col("_valid").desc())
thin_win = thin.withColumn(
    "_is_first",
    F.lag("id").over(w_sorted_t).isNull()
    | (F.lag("id").over(w_sorted_t) != F.col("id"))
    | (F.lag("version").over(w_sorted_t) != F.col("version")),
).withColumn(
    "_parent_ok",
    F.max(F.when((et == "StopPlace") & F.col("_geom_ok")
                 & F.col("_valid"), 1).otherwise(0)
          ).over(Window.partitionBy("_pkh", "_pkey")),
).filter(F.col("_valid") & F.col("_is_first"))

stops_aux = validity_filter(e0, AS_OF).filter(
    (et == "StopPlace") & F.col("geom_wkt").isNotNull()
).select("doc_id", "id",
         own_stop_type(F.col("props")).alias("own_type"),
         adjacent_sites_sorted(F.col("props")).alias("adj_sorted"))

adj_sg = adjacency_final_types_from_aux(stops_aux)

# broadcast-prune formulation
edges = stops_aux.filter(F.size("adj_sorted") > 0).select(
    "id", "own_type", F.explode("adj_sorted").alias("ref"))
ref_ids = edges.select("ref").distinct()
ref_types = stops_aux.join(
    F.broadcast(ref_ids), stops_aux["id"] == ref_ids["ref"], "left_semi"
).select(F.col("id").alias("_rid"), F.col("own_type").alias("ref_type"))
adj_bp = (
    edges.join(F.broadcast(ref_types), edges["ref"] == F.col("_rid"), "left")
    .groupBy("id")
    .agg(F.array_join(
        F.array_sort(F.array_distinct(
            F.array_append(F.collect_set("ref_type"), F.first("own_type")))),
        "_").alias("final_joined_type"))
)

variants = [
    ("w_full", windowed(keyed_frame(False))),
    ("w_pruned", windowed(keyed_frame(True))),
    ("w_thin", thin_win),
    ("adj_sg", adj_sg),
    ("adj_bp", adj_bp),
]

def noop(df):
    df.write.format("noop").mode("overwrite").save()

for name, df in variants:  # warm (JIT + cache)
    noop(df)

results = {{name: [] for name, _ in variants}}
for rnd in range({rounds}):
    for name, df in variants:
        s0, t0 = steal_jiffies(), time.perf_counter()
        noop(df)
        wall = time.perf_counter() - t0
        steal = (steal_jiffies() - s0) / 100.0
        results[name].append(
            (round(wall, 3), round(steal / (CORES * wall), 3)))

print("RESULT " + json.dumps({{"cores": CORES, "runs": results}}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10000000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    docs_path = f"/tmp/asag_bench/docs_{args.docs}"
    assert os.path.exists(os.path.join(docs_path, "_SUCCESS")), docs_path

    code = SNIPPET.format(repo=REPO, cores=args.cores, docs_path=docs_path,
                          rounds=args.rounds)
    env = dict(os.environ, PYTHONPATH=REPO, OPENBLAS_NUM_THREADS="1",
               OMP_NUM_THREADS="1")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=5400)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            print(line)
            print(f"\n{'variant':<10}{'min wall':>10}{'steal@min':>10}  all (wall,steal)")
            for name, runs in r["runs"].items():
                best = min(runs, key=lambda x: x[0])
                print(f"{name:<10}{best[0]:>10.3f}{best[1]:>10.3f}  {runs}")
            return
    raise RuntimeError(f"no RESULT:\n{out.stderr[-3000:]}")


if __name__ == "__main__":
    main()
