"""Bench harness — one JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. The geospatial
headline runs on the deterministic scale docs table (FIXTURES.md §3 —
seeded generator, Zipf-skewed cells; no external data), materialized
once to parquet under /tmp so timings measure the pipeline, not
datagen.

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": ..., plus throughput extras}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from asag_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 1M docs: large enough that per-job fixed costs (session, JIT, scan
# setup) stop dominating — measured 115k docs/s at 1M vs ~45k at 200k
# on identical code; the generated input is cached under /tmp per size
N_DOCS = int(os.environ.get("ASAG_BENCH_DOCS", "1000000"))
AS_OF = "2019-01-01T00:00:00"


def bench_docs_path(spark) -> str:
    """Materialize the deterministic scale docs table once per size."""
    path = f"/tmp/asag_bench/docs_{N_DOCS}"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from asag_spark.datagen import generate_docs

        generate_docs(spark, N_DOCS).write.mode("overwrite").parquet(path)
    return path


def _task_skew_check(spark, run, group: str = "skewcheck") -> dict:
    """SURVEY §7.3's promise, implemented: run the flagship stage once
    under a dedicated job group with event logging on, parse the event
    log's TaskEnd records for that group's stages, and assert no single
    task ran longer than x̄ + 4σ of its stage — the measured evidence
    that the salted-repartition path (SURVEY §4.2) actually flattens
    the Zipf-skewed cell distribution at local[32].

    The literal x̄ + 4σ rule alone would flag perfectly-flat stages
    (32 identical 100 ms tasks, one at 101 ms: σ≈0.2 ms → violation),
    so a violation additionally requires the max to exceed the mean by
    an absolute scheduler-jitter floor (250 ms) and a 1.25× ratio —
    i.e. the assertion fires on genuine stragglers, not timer noise.
    Returns the per-stage stats for BENCH extras; raises RuntimeError
    on violation unless ASAG_BENCH_SKEW_ASSERT=0."""
    import glob
    import math

    sc = spark.sparkContext
    sc.setJobGroup(group, "task-skew assertion run")
    try:
        run()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)

    stages_of_group: set[int] = set()
    durs: dict[int, list[float]] = {}
    # Spark 4 writes a rolling event-log DIRECTORY per app
    # (eventlog_v2_<appid>/events_*); walk everything readable
    paths = [
        p for p in glob.glob("/tmp/asag_bench/eventlog/**", recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for path in paths:
        with open(path, errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    if props.get("spark.jobGroup.id") == group:
                        stages_of_group.update(ev.get("Stage IDs") or [])
                elif e == "SparkListenerTaskEnd":
                    sid = ev.get("Stage ID")
                    if sid not in stages_of_group:
                        continue
                    if (ev.get("Task End Reason") or {}).get("Reason") != "Success":
                        continue
                    ti = ev.get("Task Info") or {}
                    d = float(ti.get("Finish Time", 0)) - float(
                        ti.get("Launch Time", 0)
                    )
                    if d > 0:
                        durs.setdefault(sid, []).append(d)

    stats, violations = [], []
    for sid in sorted(durs):
        ds = durs[sid]
        n = len(ds)
        mean = sum(ds) / n
        var = sum((x - mean) ** 2 for x in ds) / n
        std = math.sqrt(var)
        mx = max(ds)
        bad = (
            n >= 16
            and mx > mean + 4.0 * std
            and mx > 1.25 * mean
            and mx - mean > 250.0
        )
        stats.append(
            {
                "stage": sid,
                "n_tasks": n,
                "mean_ms": round(mean, 1),
                "std_ms": round(std, 1),
                "max_ms": round(mx, 1),
                "max_over_mean": round(mx / mean, 3) if mean else None,
                "violation": int(bad),
            }
        )
        if bad:
            violations.append(sid)
    if violations and os.environ.get("ASAG_BENCH_SKEW_ASSERT", "1") != "0":
        raise RuntimeError(
            f"task-skew assertion failed (SURVEY §7.3): stages {violations} "
            f"have a task > x̄ + 4σ: {stats}"
        )
    return {"task_skew_stages": stats, "task_skew_violations": len(violations)}


def main() -> None:
    # 16m split size: the bench parquet files are small, and the default
    # 128m bin-packing collapses the scan (and with it the Arrow
    # extraction stage) into a handful of partitions.
    #
    # Resources sized like a real 32-core executor group (see
    # tools/bench_scaling.py): heap pre-touched — a fixed 20g heap at
    # 32 concurrent tasks starved early builds (steady-state GC 68% of
    # task time), the current pipeline is comfortable at 24g (measured
    # parity with 48g across the suite, ±10%) — and shuffle dirs on
    # tmpfs, the analog of per-executor local NVMe (this sandbox's
    # single virtio /tmp inflated concurrent shuffle writes 6.4x).
    #
    # Capped at 24g: this guest faults in host memory at ~5 GB/s below
    # ~24g of pre-touch but collapses to ~0.1 GB/s beyond it (measured
    # 4.6-20 s for a bare -Xms24g -XX:+AlwaysPreTouch JVM vs 250-470 s
    # at 32-48g, repeatedly), so a 48g pre-touched heap costs ~7 min of
    # startup for no measurable query-time gain. THP is worse still
    # (madvise defrag: 24g pre-touch took 264 s).
    heap_gb = os.environ.get(
        "ASAG_DRIVER_MEM", f"{min(24, max(8, round(1.5 * CPUS)))}g"
    )
    os.environ["ASAG_DRIVER_MEM"] = heap_gb
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    # event log feeds _task_skew_check's per-task durations (the UI —
    # and with it the REST taskList — is off for speed); cleared per
    # run so the parse only ever sees this session
    import shutil

    shutil.rmtree("/tmp/asag_bench/eventlog", ignore_errors=True)
    os.makedirs("/tmp/asag_bench/eventlog", exist_ok=True)
    spark = get_spark("asag_bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 16),
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": "16m",
                          "spark.eventLog.enabled": "true",
                          "spark.eventLog.compress": "false",
                          "spark.eventLog.dir": "file:///tmp/asag_bench/eventlog",
                          "spark.local.dir": "/dev/shm/spark-local",
                          "spark.driver.extraJavaOptions":
                              "-XX:ReservedCodeCacheSize=1g "
                              "-XX:+UseCodeCacheFlushing -XX:+UseParallelGC "
                              f"-Xms{heap_gb} -XX:+AlwaysPreTouch",
                      })
    from asag_spark.datagen import generate_zones
    from asag_spark.functions import assign_tiles
    from asag_spark.geo.tiles import rasterize_density, tile_feature_collections
    from asag_spark.operators.dedup import lsh_candidate_pairs
    from asag_spark.operators.enrich import build_features
    from asag_spark.operators.knn import knn_join
    from asag_spark.operators.pip import pip_join
    from asag_spark.operators.similarity import cosine_topk

    docs_path = bench_docs_path(spark)
    docs = spark.read.parquet(docs_path)
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def _cpu_steal() -> tuple[float, float]:
        # (steal_jiffies, total_jiffies) summed over all cpus
        with open("/proc/stat") as fh:
            f = fh.readline().split()
        vals = [float(x) for x in f[1:]]
        return vals[7] if len(vals) > 7 else 0.0, sum(vals)

    steal_at_min: dict[str, float] = {}

    def timed(name: str, fn, warm: int = 0, repeats: int = 2, max_repeats: int = 4):
        # warm runs: tiered JIT over the wide codegen'd projections needs
        # 1-3 full passes to steady state (production executors are
        # long-running, so steady state is the honest number). Best-of-N
        # timed runs: this box is a shared guest with bursty CPU steal
        # (measured 2-6x wall swings on identical actions), and min over
        # a few runs is the standard unbiased-under-noise estimator.
        # Adaptive tail: if the two best runs still disagree by >1.3x a
        # steal burst likely polluted the sample — take extra runs (cap
        # max_repeats) so one bad window can't masquerade as a 2x
        # regression in the per-round single-shot record.
        # Per-run hypervisor steal is sampled so a polluted record is
        # SELF-DESCRIBING: steal_at_min >~ 0.05 means the best run of
        # this op was taken inside a steal burst and its wall time says
        # more about the host than the engine (same practice as the
        # pinned scaling ladder in BENCH/BASELINE.md).
        for _ in range(warm):
            fn()
        walls, steals, out = [], [], None

        def one_run():
            nonlocal out
            s0, t0j = _cpu_steal()
            t0 = time.perf_counter()
            out = fn()
            wall = time.perf_counter() - t0
            s1, t1j = _cpu_steal()
            walls.append(wall)
            steals.append((s1 - s0) / max(t1j - t0j, 1.0))

        for _ in range(repeats):
            one_run()
        while len(walls) < max_repeats:
            top2 = sorted(walls)[:2]
            if len(top2) >= 2 and top2[1] <= 1.3 * top2[0]:
                break
            one_run()
        i_best = min(range(len(walls)), key=walls.__getitem__)
        timings[name] = round(walls[i_best], 3)
        steal_at_min[name] = round(steals[i_best], 4)
        return out

    def materialize(df):
        # Full materialization via the noop sink: count() lets Catalyst
        # prune computed columns (properties, tile cells) out of the
        # plan and under-measures the pipeline >5x.
        df.write.format("noop").mode("overwrite").save()

    def _membw_probe_ms() -> float:
        # Host memory-bandwidth self-calibration: best-of-3 sum over a
        # 400 MB double array. Steal-from-/proc/stat misses NEIGHBOR
        # bandwidth contention entirely (observed: 3-6x query-wall
        # inflation at 0.000 steal) — this single number makes such a
        # run self-describing the same way steal_at_min does. Quiet
        # baseline on this guest ~25-35 ms; 55-70 ms reads as ~2x
        # degraded memory bandwidth and inflated timings.
        import numpy as np

        # deterministic fill (np.ones, not unseeded rand: generation
        # time is irrelevant noise before the timed sum) sized off
        # MemAvailable so a memory-tight host isn't pushed into swap
        # by the probe itself; the reported ms is normalized to the
        # 400 MB reference size so thresholds stay comparable
        n = 50_000_000
        try:
            with open("/proc/meminfo") as f:
                mem = {ln.split(":")[0]: int(ln.split()[1])
                       for ln in f if ":" in ln}
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

    # quiet-window gate (VERDICT r03 #2): the per-round committed bench
    # must be a quiet-host sample, not the worst window of the round.
    # Wait for the bandwidth probe to read inside the calibrated-good
    # band (< 40 ms normalized; quiet baseline 25-35 ms) before the
    # flagship stage — up to ASAG_BENCH_QUIET_WAIT_S in 20 s steps. If
    # the window never opens, proceed and mark host_degraded=1 so the
    # artifact is self-describing either way.
    gate_ms = float(os.environ.get("ASAG_BENCH_QUIET_MS", "40"))
    wait_s = float(os.environ.get("ASAG_BENCH_QUIET_WAIT_S", "300"))
    waited = 0.0
    mb = _membw_probe_ms()
    while mb >= gate_ms and waited < wait_s:
        time.sleep(20.0)
        waited += 20.0
        mb = _membw_probe_ms()
    extras["host_membw_ms_start"] = mb
    extras["quiet_gate_ms"] = gate_ms
    extras["quiet_gate_waited_s"] = round(waited, 1)
    extras["host_degraded"] = int(mb >= gate_ms)

    # 1. flagship: docs → features → tile assignment (the north-rule metric)
    feats = build_features(docs, as_of=AS_OF)
    tiled = assign_tiles(feats)
    timed("tile_assignment", lambda: materialize(tiled), warm=2)
    extras["docs_per_sec_tile_assignment"] = round(N_DOCS / timings["tile_assignment"], 1)
    # SURVEY §7.3: per-task skew assertion on the (already warm)
    # flagship stage — one extra materialize under a job group, stats
    # into extras, RuntimeError if any stage grew a straggler
    extras.update(_task_skew_check(spark, lambda: materialize(tiled)))

    # Materialize the tiled feature table once, as the checkpointed job
    # does (plans/job.py stage boundary): downstream stages read the
    # compact columnar stage output instead of re-running doc extraction
    # per consumer — the same stage isolation a 100 TB run relies on.
    tiled_path = f"/tmp/asag_bench/tiled_{N_DOCS}"
    t0 = time.perf_counter()
    tiled.write.mode("overwrite").parquet(tiled_path)
    extras["tiled_stage_write_s"] = round(time.perf_counter() - t0, 3)
    tiled = spark.read.parquet(tiled_path)
    extras["n_features"] = tiled.count()

    # thin (id, lon, lat) frame is cheap to cache and feeds pip + knn
    feats_pts = tiled.filter(F.col("lat").isNotNull()).select(
        "feature_id", "lon", "lat"
    ).cache()
    n_pts = feats_pts.count()

    # 2. PIP join against the 50 municipality polygons (broadcast side)
    zones = generate_zones(spark)
    pip = pip_join(feats_pts, zones)
    timed("pip_join", lambda: materialize(pip), warm=1)
    extras["pip_pairs"] = pip.count()
    extras["pip_points_per_sec"] = round(n_pts / timings["pip_join"], 1)

    # 2b. broadcast-free PIP (the continent-scale-polygon plan): same
    # output rows, two narrow shuffles instead of a broadcast index
    from asag_spark.operators.pip import pip_join_partitioned

    pipp = pip_join_partitioned(feats_pts, zones)
    timed("pip_partitioned", lambda: materialize(pipp), warm=1)

    # 2c. nearest-boundary-edge snap: zero-shuffle broadcast-edge
    # kernel, every point x every zone edge vectorized per batch
    from asag_spark.operators.pip import snap_to_boundary

    snap = snap_to_boundary(feats_pts, zones)
    # warm=2: the snap kernel shows a long JIT/page-fault ramp
    # (measured 27 -> 15 -> 3.3 s steady on identical input) — one
    # warm pass is still inside the ramp. Since r4 the auto gate picks
    # the PRUNED strategy here (300 edges > SNAP_DENSE_MAX_EDGES):
    # cell-bucketed candidates instead of the dense (n x E) cross.
    timed("boundary_snap", lambda: materialize(snap), warm=2)

    # 2d. the same snap against a DENSE zone cloud (2.5k zones /
    # 10k edges — the continent-scale-cadastre shape): per-point cost
    # under the prune tracks LOCAL edge density, so this stays in the
    # boundary_snap class instead of scaling 50x with the edge count
    from asag_spark.datagen import generate_dense_zone_grid

    dense_zones = generate_dense_zone_grid(spark, nx=50, ny=50)
    extras["dense_cloud_edges"] = 4 * 50 * 50
    snap_cloud = snap_to_boundary(feats_pts, dense_zones)
    timed("boundary_snap_cloud", lambda: materialize(snap_cloud), warm=2)

    # 2e. the DISTRIBUTED snap at a >10^5-edge cadastre (VERDICT r04
    # #1's done-criterion): 25.6k zones / 102.4k edges trip the second
    # auto gate, so the edge index builds executor-side (no driver
    # collect, no dense broadcast) and the search runs the coarsening
    # ladder. The operator runs jobs during construction (per-round
    # closure counts), so the build is INSIDE the timed lambda — the
    # index-build cost the round-4 verdict wanted recorded is part of
    # this number, split out in extras.
    from asag_spark.operators.pip import snap_to_boundary as _snap_fn

    huge_zones = generate_dense_zone_grid(spark, nx=160, ny=160)
    # deterministic 1-in-5 point subsample: the leg's subject is the
    # EDGE-scale plan (index build + ladder at 102k edges); the point
    # fan-in is already priced by boundary_snap/boundary_snap_cloud
    snap_dist_pts = feats_pts.filter(
        F.pmod(F.xxhash64("feature_id"), F.lit(5)) == 0
    )

    def run_snap_dist():
        t_b = time.perf_counter()
        sd = _snap_fn(snap_dist_pts, huge_zones, mode="distributed")
        extras["snap_dist_ladder_s"] = round(time.perf_counter() - t_b, 3)
        materialize(sd)

    timed("boundary_snap_dist", run_snap_dist, warm=1)
    extras["snap_dist_edges"] = 4 * 160 * 160

    # 3. kNN on a deterministic 1-in-20 subsample (bounded-radius contract)
    sample = feats_pts.filter(F.pmod(F.xxhash64("feature_id"), F.lit(20)) == 0)
    knn = knn_join(sample, k=3)
    timed("knn_join", lambda: materialize(knn), warm=2)
    extras["knn_pairs"] = knn.count()

    # 4. tile assembly + raster density
    timings_src = tiled.select("h3_r7", "section", "feature_id",
                               "geometry_wkt", "lon", "lat", "properties",
                               "adjacent_sites")
    tiles_fc = tile_feature_collections(timings_src, "h3_r7")
    timed("tile_assembly", lambda: materialize(tiles_fc), warm=2)
    extras["n_tiles"] = tiles_fc.count()
    raster = rasterize_density(tiled, "h3_r9")
    timed("rasterize", lambda: materialize(raster), warm=1)
    extras["raster_cells"] = raster.count()

    # 4b. Mapbox-space tiling: zoom pyramid over all point features
    # (one wide base agg + shift rollups) and polygon pixel coverage
    from asag_spark.geo.tiles import rasterize_polygons_xyz
    from asag_spark.geo.xyz import tile_pyramid

    pyramid = tile_pyramid(feats_pts, base_zoom=12, min_zoom=5)
    timed("xyz_pyramid", lambda: materialize(pyramid), warm=1)
    extras["pyramid_tiles"] = pyramid.count()

    # this session: quadtree compaction of the z12 coverage set to the
    # minimal mixed-zoom cover (one window shuffle per level on a
    # >=4x-shrinking frontier)
    from asag_spark.geo.xyz import compact_tiles, tile_x, tile_y

    cover12 = feats_pts.select(
        tile_x(F.col("lon"), 12).alias("x"), tile_y(F.col("lat"), 12).alias("y")
    )
    compacted = compact_tiles(cover12, zoom=12, min_zoom=0)
    timed("compact_tiles", lambda: materialize(compacted), warm=1)
    extras["compact_out_tiles"] = compacted.count()
    poly_raster = rasterize_polygons_xyz(zones, zoom=11, extent=16)
    timed("polygon_raster", lambda: materialize(poly_raster), warm=1)
    extras["polygon_raster_tiles"] = poly_raster.count()

    # MVT tile slicing of the same polygon set: S-H clip into z12
    # tiles, extent-4096 local rings (zero-exchange Arrow pass)
    from asag_spark.geo.xyz import clip_polygons_to_tiles

    poly_clip = clip_polygons_to_tiles(
        zones.withColumnRenamed("zone_id", "feature_id"), zoom=12
    )
    timed("polygon_clip", lambda: materialize(poly_clip), warm=1)
    extras["clip_rows"] = poly_clip.count()
    from asag_spark.operators.overlap import zone_overlap_join

    overlap = zone_overlap_join(zones)
    timed("zone_overlap", lambda: materialize(overlap), warm=1)
    extras["overlap_pairs"] = overlap.count()

    # 4c. zoom-dependent polygon thinning: 5k deterministic 64-vertex
    # noisy rings through the DP Arrow kernel (tol approximates one
    # z11 pixel); vertex reduction recorded so the wall is attributable
    from asag_spark.geo.simplify import simplify_polygons

    ring_idx = F.sequence(F.lit(0), F.lit(63))
    two_pi = 6.283185307179586
    dense_rings = (
        spark.range(5000).select(
            F.concat(F.lit("R"), F.col("id")).alias("zone_id"),
            F.concat(
                F.lit("POLYGON(("),
                F.array_join(
                    F.transform(
                        ring_idx,
                        lambda i: F.concat(
                            F.round(10.0 + (0.3 + F.pmod(F.xxhash64("id", i), 1000) / 50000.0)
                                    * F.cos(i * F.lit(two_pi / 64)), 7).cast("string"),
                            F.lit(" "),
                            F.round(60.0 + (0.3 + F.pmod(F.xxhash64("id", i, F.lit(1)), 1000) / 50000.0)
                                    * F.sin(i * F.lit(two_pi / 64)), 7).cast("string"),
                        ),
                    ),
                    ", ",
                ),
                F.lit(", "),
                F.round(10.0 + (0.3 + F.pmod(F.xxhash64("id", F.lit(0)), 1000) / 50000.0), 7).cast("string"),
                F.lit(" 60.0))"),
            ).alias("geom_wkt"),
        )
    )
    simp = simplify_polygons(dense_rings, tolerance=0.01)
    timed("polygon_simplify", lambda: materialize(simp), warm=1)
    red = simp.agg(F.sum("n_before"), F.sum("n_after")).collect()[0]
    extras["simplify_vertices_before"] = int(red[0])
    extras["simplify_vertices_after"] = int(red[1])

    # 5. training-data ops on the provided tables
    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    timed("minhash_lsh", lambda: materialize(lsh_candidate_pairs(documents)), warm=2)
    timed(
        "cosine_topk",
        lambda: materialize(cosine_topk(
            embeddings, embeddings.filter(F.col("vec_id") < 16), k=10
        )),
        warm=1,
    )
    # IVF-flat ANN (the coarse-quantized scale path): probe cost is the
    # honest number to track — centroid selection IS hoisted out of the
    # timed region (a one-off per corpus, passed via the centroids arg)
    from asag_spark.operators.similarity import ivf_centroids, ivf_topk

    ivf_cent = ivf_centroids(embeddings)
    timed(
        "ivf_topk",
        lambda: materialize(ivf_topk(
            embeddings, embeddings.filter(F.col("vec_id") < 16), k=10,
            centroids=ivf_cent,
        )),
        warm=1,
    )
    # IVF index at a size where pruning is visible: 2M clustered 64-d
    # vectors (deterministic generator — FIXTURES.md-style, no external
    # data). The brute matmul scans all 2M rows per batch; the indexed
    # probe reads ONLY the probed cell partitions (file-level pruning —
    # a 4-query batch at nprobe=4 over 64 cells touches ≲25% of the
    # files; clustered queries usually share cells). Corpus + index are
    # built once per size and cached like the docs table (at scale the
    # layout pass is a one-off the corpus pays once); build time is
    # recorded in extras when it happens.
    from asag_spark.datagen import generate_embeddings
    from asag_spark.operators.similarity import ivf_index_write, ivf_topk_indexed

    n_vecs = int(os.environ.get("ASAG_BENCH_VECS", "2000000"))
    emb_path = f"/tmp/asag_bench/emb_{n_vecs}"
    if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        generate_embeddings(spark, n_vecs).write.mode("overwrite").parquet(emb_path)
    big_emb = spark.read.parquet(emb_path)
    ivf_path = f"/tmp/asag_bench/ivf_{n_vecs}"
    if not os.path.exists(os.path.join(ivf_path, "index", "_SUCCESS")):
        t0 = time.perf_counter()
        ivf_index_write(big_emb, ivf_path, n_cells=64)
        extras["ivf_index_build_s"] = round(time.perf_counter() - t0, 3)
    qbig = big_emb.filter(F.col("vec_id") < 4)
    timed(
        "cosine_topk_2m",
        lambda: materialize(cosine_topk(big_emb, qbig, k=10)),
        warm=1,
    )
    # SQ8 quantized path over the same 2M corpus — the compressed-read
    # story next to the float brute number. The corpus max-abs sidecar
    # is hoisted like the IVF centroids (a one-off stats pass at
    # corpus-build time, reused by every query batch).
    from asag_spark.operators.similarity import sq8_scale, sq8_topk

    sq8_ma = sq8_scale(big_emb)
    timed(
        "sq8_topk_2m",
        lambda: materialize(sq8_topk(big_emb, qbig, k=10, scale=sq8_ma)),
        warm=1,
    )
    # the DEPLOYED SQ8 shape: codes encoded once at corpus-build time,
    # queries served from the one-byte-per-dim code scan — the
    # bandwidth saving is physical (extras record the on-disk bytes of
    # codes vs float embeddings)
    from asag_spark.operators.similarity import sq8_encode, sq8_topk_encoded

    sq8_path = f"/tmp/asag_bench/sq8_{n_vecs}"
    if not os.path.exists(os.path.join(sq8_path, "codes", "_SUCCESS")):
        t0 = time.perf_counter()
        sq8_encode(big_emb, sq8_path, scale=sq8_ma)
        extras["sq8_encode_s"] = round(time.perf_counter() - t0, 3)
    timed(
        "sq8_encoded_2m",
        lambda: materialize(sq8_topk_encoded(spark, sq8_path, qbig, k=10)),
        warm=1,
    )

    def _dir_bytes(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p) for f in fs
        )

    extras["sq8_code_bytes"] = _dir_bytes(os.path.join(sq8_path, "codes"))
    extras["emb_float_bytes"] = _dir_bytes(emb_path)

    # PQ/ADC over the same 2M corpus: m-bytes-per-vector codes (the
    # third compression point after float and SQ8), LUT-gather scoring;
    # encoded = the deployment shape (codes scan only), refined = the
    # recall-restoring exact rerank of the r=50 shortlist
    from asag_spark.operators.similarity import (
        pq_codebook, pq_encode, pq_topk, pq_topk_encoded, pq_topk_refined,
    )

    _, pq_cb = pq_codebook(big_emb)
    pq_path = f"/tmp/asag_bench/pq_{n_vecs}"
    if not os.path.exists(os.path.join(pq_path, "codes", "_SUCCESS")):
        t0 = time.perf_counter()
        pq_encode(big_emb, pq_path, codebook=pq_cb)
        extras["pq_encode_s"] = round(time.perf_counter() - t0, 3)
    timed(
        "pq_topk_2m",
        lambda: materialize(pq_topk(big_emb, qbig, k=10, codebook=pq_cb)),
        warm=1,
    )
    timed(
        "pq_encoded_2m",
        lambda: materialize(pq_topk_encoded(spark, pq_path, qbig, k=10)),
        warm=1,
    )
    timed(
        "pq_refined_2m",
        lambda: materialize(
            pq_topk_refined(big_emb, qbig, k=10, r=50, codebook=pq_cb)
        ),
        warm=1,
    )
    extras["pq_code_bytes"] = _dir_bytes(os.path.join(pq_path, "codes"))

    # IVF-PQ composed index: cell-pruned probe over the codes-only
    # layout (+ exact refine) — the 10^12-vector serving shape
    from asag_spark.operators.similarity import ivfpq_index_write, ivfpq_topk

    ivfpq_path = f"/tmp/asag_bench/ivfpq_{n_vecs}"
    if not os.path.exists(os.path.join(ivfpq_path, "index", "_SUCCESS")):
        t0 = time.perf_counter()
        ivfpq_index_write(big_emb, ivfpq_path, n_cells=64, codebook=pq_cb)
        extras["ivfpq_index_build_s"] = round(time.perf_counter() - t0, 3)
    timed(
        "ivfpq_topk_2m",
        lambda: materialize(ivfpq_topk(spark, ivfpq_path, qbig, k=10)),
        warm=1,
    )
    timed(
        "ivfpq_refined_2m",
        lambda: materialize(
            ivfpq_topk(spark, ivfpq_path, qbig, k=10, refine_from=big_emb)
        ),
        warm=1,
    )
    extras["ivfpq_index_bytes"] = _dir_bytes(os.path.join(ivfpq_path, "index"))
    timed(
        "ivf_indexed_2m",
        lambda: materialize(ivf_topk_indexed(spark, ivf_path, qbig, k=10)),
        warm=1,
    )
    # the scale evidence is the scanned FRACTION (at 512 MB job fixed
    # costs mask the wall-clock gap; at 100 TB the fraction IS the win)
    from asag_spark.operators.similarity import ivf_probe_cells

    probed = ivf_probe_cells(spark, ivf_path, qbig)
    extras["ivf_probed_cells"] = len(probed)
    extras["ivf_cells_total"] = 64
    extras["ivf_rows_scanned"] = (
        spark.read.parquet(f"{ivf_path}/index")
        .filter(F.col("ivf_cell").isin(probed)).count()
    )
    extras["ivf_corpus_rows"] = n_vecs

    # scale-path dedup family (banded hyperplane LSH / 64-bit SimHash
    # in 4x16 bands since round 3): benched so regressions are
    # attributable
    from asag_spark.operators.dedup import embedding_near_dups, simhash_near_dups

    timed(
        "emb_near_dups",
        lambda: materialize(embedding_near_dups(embeddings, threshold=0.3)),
        warm=1,
    )
    timed(
        "simhash_near_dups",
        lambda: materialize(simhash_near_dups(documents, max_hamming=3)),
        warm=1,
    )
    # full dedup assignment: pairs → connected components → labels
    # (iterative: 2 shuffles/round + an exact-termination count; wall
    # includes the pair production so the number is the whole pipeline)
    from asag_spark.operators.dedup import dedup_clusters, minhash_dedup

    timed(
        "dedup_clusters",
        lambda: materialize(dedup_clusters(minhash_dedup(documents, threshold=0.2))),
        warm=1,
    )

    # keyword extraction + corpus profile (one explode-agg pipeline each)
    from asag_spark.operators.text import corpus_stats, tfidf_top_terms

    timed("tfidf_top", lambda: materialize(tfidf_top_terms(documents, k=3)), warm=1)
    timed("corpus_stats", lambda: materialize(corpus_stats(documents)), warm=1)

    # Gopher repetition metrics: zero-exchange array-fold pass
    from asag_spark.operators.text import repetition_stats

    timed("repetition", lambda: materialize(repetition_stats(documents)), warm=1)

    # this session: PII scrub (zero-exchange per-row regex) and one
    # BPE merge-scoring pass (vocab-bounded shuffles)
    from asag_spark.operators.text import bpe_pair_counts, pii_scrub

    timed("pii_scrub", lambda: materialize(pii_scrub(documents)), warm=1)
    timed("bpe_pairs", lambda: materialize(bpe_pair_counts(documents)), warm=1)

    # bigram-LM fluency scoring: LM train (two vocab-keyed combines)
    # + per-doc NLL join in one job
    from asag_spark.operators.text import lm_bigram_score

    timed("lm_score", lambda: materialize(lm_bigram_score(documents)), warm=1)

    # overlapping-window exact-substring scrub (Lee-et-al pass):
    # n x corpus tokens through one window-keyed count + reassembly
    from asag_spark.operators.dedup import ngram_span_scrub

    timed(
        "ngram_scrub",
        lambda: materialize(ngram_span_scrub(documents)),
        warm=1,
    )

    # round-3 training-data additions: global prefix-sum packing,
    # winnow-fp decontamination join, time-bucketed range join
    from asag_spark.operators.events import range_join_counts
    from asag_spark.operators.text import contamination_check, seq_pack

    timed("seq_pack", lambda: materialize(seq_pack(documents)), warm=1)
    timed(
        "contamination",
        lambda: materialize(contamination_check(documents)),
        warm=1,
    )
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    timed("range_join", lambda: materialize(range_join_counts(ev)), warm=1)

    # eps-connectivity spatial clustering. Two rows, two plans:
    #   spatial_clusters      — the live-query parity row (global
    #                           iterative CC over the SF documents-
    #                           derived cloud; CC round fixed costs
    #                           dominate at this size)
    #   spatial_clusters_1m   — the web-scale plan at bench scale:
    #                           N_DOCS points in ~N/12.5 isolated
    #                           md5-jittered blobs (the fixture's
    #                           density, scaled; pair volume linear in
    #                           points), two-level local-union-find +
    #                           boundary-label merge
    import math

    import __spark_entry__ as entry_mod
    from asag_spark.operators.cluster import spatial_clusters_partitioned
    from asag_spark.operators.text import hash_unit

    timed(
        "spatial_clusters",
        lambda: materialize(entry_mod._g_spatial_clusters(spark, SF_DIR)),
        warm=1,
    )

    k_grid = int(math.ceil(math.sqrt(N_DOCS / 12.5)))
    pid = F.col("id")
    pts = spark.range(N_DOCS).select(
        pid.alias("point_id"),
        ((pid % k_grid).cast("double") * F.lit(0.05)
         + (hash_unit("id", "bench-x") - F.lit(0.5)) * F.lit(0.002)).alias("lon"),
        ((F.expr(f"id div {k_grid}") % k_grid).cast("double") * F.lit(0.05)
         + (hash_unit("id", "bench-y") - F.lit(0.5)) * F.lit(0.002)).alias("lat"),
    )
    n_clusters = {}

    def _run_spatial_1m():
        out = spatial_clusters_partitioned(pts, eps=0.002)
        n_clusters["v"] = out.agg(
            F.countDistinct("cluster_id").alias("c")
        ).collect()[0]["c"]

    timed("spatial_clusters_1m", _run_spatial_1m, warm=1)
    extras["spatial_points"] = float(N_DOCS)
    extras["spatial_n_clusters"] = float(n_clusters.get("v", 0))

    # epoch shuffle at corpus scale: N_DOCS ids → 64 shards. One hash
    # exchange + per-shard sort; measures the training-order
    # permutation the mixing ops feed into (no global sort plan).
    from asag_spark.operators.text import train_shuffle

    ids = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    timed(
        "train_shuffle_1m",
        lambda: materialize(train_shuffle(ids, n_shards=64)),
        warm=1,
    )

    # 5b. curation driver end-to-end (plans/curate.py): the composed
    # gates→scrub→dedup→shard pipeline users actually run — benched as
    # one number so the COMPOSITION has evidence, not just the unit
    # ops (VERDICT r04 #7). Workdir cleared per run: the checkpoint
    # resume path would otherwise skip every stage after the warm run.
    import shutil as _sh

    from asag_spark.plans import curate as _curate

    curate_dir = "/tmp/asag_bench/curate_e2e"
    curate_summary: dict = {}

    def run_curate():
        _sh.rmtree(curate_dir, ignore_errors=True)
        curate_summary.clear()
        curate_summary.update(_curate.run(
            spark, f"{SF_DIR}/documents.parquet", curate_dir,
            quality_gate="topq",
        ))

    timed("curate_e2e", run_curate, warm=1)
    extras["curate_funnel"] = curate_summary.get("funnel")
    extras["curate_stage_s"] = {
        s["stage"]: round(s.get("wall_ms", 0) / 1000.0, 3)
        for s in curate_summary.get("stages", [])
        if isinstance(s, dict)
    }
    n_cur_in = (curate_summary.get("funnel") or {}).get("input", 0)
    extras["curate_docs_per_sec"] = round(
        n_cur_in / timings["curate_e2e"], 1
    ) if n_cur_in else None

    # 6. relational headliners
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    timed(
        "q1_agg",
        lambda: li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.count(F.lit(1)))
        .collect(),
        warm=1,
    )

    extras["host_membw_ms_end"] = _membw_probe_ms()
    extras["steal_at_min"] = steal_at_min
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "stop_place_tile_assignment_plus_headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "cpus": CPUS,
                "bench_docs": N_DOCS,
                "extras": extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
