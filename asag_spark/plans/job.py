"""spark-submit entry point: the full checkpointed pipeline
(E1's Camel route, re-expressed as a staged Spark driver — SURVEY.md §3).

    spark-submit --py-files asag_spark.zip -m asag_spark.plans.job \\
        --input <docs parquet> --workdir <checkpoint dir> [--zones <parquet>]

Stages (each checkpointed with lineage + per-partition metrics,
resumable — plans/checkpoint.py):
    extract_features  docs → asag-parity feature table
    tile_assign       + H3 res7-10 / S2 cells
    pip               (stop, zone) pairs when zones given
    tiles             per-h3_r7 GeoJSON FeatureCollections
    pyramid           Web-Mercator zoom-pyramid tile counts (z5..z12)
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="docs parquet dir")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--zones", default=None, help="zones parquet dir")
    ap.add_argument("--as-of", default="2019-01-01T00:00:00")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from asag_spark.functions import assign_tiles
    from asag_spark.geo.tiles import tile_feature_collections
    from asag_spark.operators.enrich import build_features
    from asag_spark.operators.pip import pip_join
    from asag_spark.plans.checkpoint import CheckpointedPipeline
    from asag_spark.session import get_spark

    spark = get_spark("asag_job", master=args.master)
    t0 = time.perf_counter()
    input_fp = hashlib.md5(
        f"{args.input}|{args.as_of}".encode()
    ).hexdigest()
    pipe = CheckpointedPipeline(spark, args.workdir, input_fp)

    docs = spark.read.parquet(args.input)
    n_docs = docs.count()

    feats = pipe.run_stage(
        "extract_features",
        lambda: build_features(docs, as_of=args.as_of),
        params=args.as_of,
    )
    tiled = pipe.run_stage("tile_assign", lambda: assign_tiles(feats))

    if args.zones:
        zones = spark.read.parquet(args.zones)
        from pyspark.sql import functions as F

        pipe.run_stage(
            "pip",
            lambda: pip_join(tiled.filter(F.col("lat").isNotNull()), zones),
            params=args.zones,
        )

    pipe.run_stage("tiles", lambda: tile_feature_collections(tiled, "h3_r7"))

    from pyspark.sql import functions as F

    from asag_spark.geo.xyz import tile_pyramid

    pipe.run_stage(
        "pyramid",
        lambda: tile_pyramid(
            tiled.filter(F.col("lat").isNotNull()), base_zoom=12, min_zoom=5
        ),
    )

    wall = time.perf_counter() - t0
    print(json.dumps({
        "n_docs": n_docs,
        "wall_s": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "stages": pipe.stage_log,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
