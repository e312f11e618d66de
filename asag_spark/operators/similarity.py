"""Similarity search over the embeddings table (task brief): exact
brute-force cosine top-k baseline + LSH-bucketed approximate variant.

Scale design: the exact path broadcasts the (small) query set against
the full corpus — a map-only pass, no shuffle except the final
per-query top-k. The approximate path restricts candidates to corpus
vectors sharing at least one random-hyperplane LSH band with the
query (the same seeded banded signature as
dedup.embedding_near_dups) — multi-band probing over
bands × 2^bits_per_band buckets, exact cosine refine on candidates
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import EMB_LSH_BANDS, EMB_LSH_BITS, band_keys, embedding_near_dups


def _with_norm(emb: DataFrame, prefix: str) -> DataFrame:
    return emb.select(
        F.col("vec_id").alias(f"{prefix}_id"),
        F.col("embedding").cast("array<double>").alias(f"{prefix}_v"),
        F.sqrt(
            F.aggregate(
                F.col("embedding").cast("array<double>"),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
        ).alias(f"{prefix}_norm"),
    )


def _cosine(av, bv, an, bn):
    # try_divide: cosine is undefined for a zero-norm vector (an empty-
    # document embedding) — NULL it instead of letting ANSI mode abort
    # the whole stage with DIVIDE_BY_ZERO; desc ranking puts NULLs last
    dot = F.aggregate(
        F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return F.round(F.try_divide(dot, an * bn), 6)


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force).

    ``queries``: frame with (vec_id, embedding) — a small selection of
    the corpus (the same smallness contract a broadcast join needs); it
    is collected and broadcast as a dense numpy matrix. Self-matches
    excluded. Output (query_id, neighbor_id, rank, cosine); ties break
    on neighbor_id for determinism.

    Scale shape: ONE matrix multiply per corpus batch ((n_batch × d) @
    (d × n_q), Arrow-vectorized mapInPandas) with per-PARTITION top-k
    reduction, then a global top-k over the tiny candidate set
    (≤ partitions × n_q × k rows). The previous formulation cross-joined
    corpus × queries into |corpus|·|queries| pair rows and folded the
    dot product with an interpreted HOF lambda per pair, then windowed
    the full pair set — at 10^9 × 100 that is 10^11 intermediate rows
    through one window; here the corpus is read once, map-side, and
    only candidates shuffle. Cosines are rounded to 6 BEFORE ranking
    (ranking on rounded values = the documented tie semantics).
    """
    import numpy as np
    from pyspark.sql import types as T

    id_type = emb.schema["vec_id"].dataType
    q_rows = queries.select(
        "vec_id", F.col("embedding").cast("array<double>")
    ).collect()
    if not q_rows:
        spark = emb.sparkSession
        out = T.StructType(
            [
                T.StructField("query_id", id_type),
                T.StructField("neighbor_id", id_type),
                T.StructField("rank", T.IntegerType()),
                T.StructField("cosine", T.DoubleType()),
            ]
        )
        return spark.createDataFrame([], out)
    q_ids = np.array([r[0] for r in q_rows])
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qn = np.sqrt((Q * Q).sum(axis=1))
    bq = emb.sparkSession.sparkContext.broadcast((q_ids, Q.T.copy(), qn))

    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def part_topk(batches):
        q_ids_v, Qt, qn_v = bq.value
        # per-query candidate pools accumulated across the partition;
        # batch-local top-k keeps everything >= the k-th value (ties at
        # the boundary resolve in the pool merge)
        pool: list = []
        for batch in batches:
            if not len(batch):
                continue
            ids = batch["vec_id"].to_numpy()
            B = np.stack(batch["embedding"].to_numpy())
            bn = np.sqrt((B * B).sum(axis=1))
            S = np.round((B @ Qt) / (bn[:, None] * qn_v[None, :]), 6)
            S[ids[:, None] == q_ids_v[None, :]] = -np.inf  # self-matches
            if len(ids) > k:
                kth = np.partition(S, -k, axis=0)[-k, :]
                keep = (S >= kth[None, :]) & (S > -np.inf)
            else:
                keep = S > -np.inf
            rows, cols = np.nonzero(keep)
            if len(rows):
                pool.append((ids[rows], cols, S[rows, cols]))
        if not pool:
            return
        merged = _local_topk(pool, q_ids_v, k)
        if merged is not None:
            yield merged

    cand = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).mapInPandas(part_topk, out_schema)
    return _rank_topk(cand, k)


def cosine_topk_lsh(emb: DataFrame, queries: DataFrame, k: int = 5,
                    nbits: int = EMB_LSH_BITS,
                    bands: int = EMB_LSH_BANDS) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing ≥1 LSH
    band key with the query (banded multi-probe; recall < 1 by design
    — the 10^12-vector scale path where the brute-force scan is off
    the table). The query side's band keys are broadcast, so the
    corpus pass is map-side band-key generation + a broadcast
    semi-probe; only candidate ids reach the distinct/refine shuffle.
    """
    qbk = band_keys(queries, nbits, bands).withColumnRenamed("vec_id", "q_id")
    cbk = band_keys(emb, nbits, bands)
    cand = (
        cbk.join(F.broadcast(qbk), "bkey")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("n_id"))
        .distinct()
    )
    q = _with_norm(queries, "q")
    c = _with_norm(emb, "n")
    scored = (
        cand.join(c, "n_id")
        .join(F.broadcast(q), "q_id")
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            _cosine(F.col("q_v"), F.col("n_v"), F.col("q_norm"), F.col("n_norm")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine")
    )


# IVF coarse-quantizer defaults: cells ~ sqrt(|corpus|) is the classic
# IVF-flat operating point; nprobe trades recall for scan fraction.
IVF_CELLS = 32
IVF_NPROBE = 4


def ivf_centroids(emb: DataFrame, n_cells: int = IVF_CELLS):
    """Deterministic coarse quantizer: the ``n_cells`` corpus vectors
    with the smallest md5(vec_id) serve as centroids (a seeded uniform
    sample — no iterative k-means, which keeps the assignment
    closed-form for the value oracle). At scale the centroid set is
    whatever the quantizer training produced; the plan downstream is
    identical — only this tiny frame changes. Returns (ids, matrix)
    with centroid columns sorted by centroid id ascending (the
    tie-break order assignment relies on); (empty, None) for an empty
    corpus."""
    import numpy as np

    rows = (
        emb.select("vec_id", F.col("embedding").cast("array<double>"))
        .withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h", "vec_id")
        .limit(n_cells)
        .select("vec_id", "embedding")
        .collect()
    )
    if not rows:
        return np.array([]), None
    rows.sort(key=lambda r: r[0])  # columns by c_id asc → argmax ties → smallest id
    c_ids = np.array([r[0] for r in rows])
    C = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    return c_ids, C


def _probe_sets(Q, qn, C, cn, nprobe: int):
    """Per-query probe membership over centroid COLUMNS (c_id asc):
    the nprobe cells nearest by 6-dp-rounded cosine, ties to the
    smaller centroid id (stable argsort over c_id-ascending columns).
    Returns the bool matrix M[c, j] = query j probes cell c."""
    import numpy as np

    SQ = np.round((Q @ C.T) / (qn[:, None] * cn[None, :]), 6)
    probe_cols = np.argsort(-SQ, axis=1, kind="stable")[:, :nprobe]
    M = np.zeros((C.shape[0], Q.shape[0]), dtype=bool)
    for j in range(Q.shape[0]):
        M[probe_cols[j], j] = True
    return M


def _local_topk(pool, q_ids_v, k):
    """Per-partition merge: pool of (neighbor_ids, query_cols, cosines)
    chunks → one pandas frame of each query's local top-k (ties on
    (cosine DESC, neighbor_id ASC) via lexsort)."""
    import numpy as np
    import pandas as pd

    nid = np.concatenate([p[0] for p in pool])
    qcol = np.concatenate([p[1] for p in pool])
    cos = np.concatenate([p[2] for p in pool])
    out_q, out_n, out_c = [], [], []
    for j in range(len(q_ids_v)):
        m = qcol == j
        if not m.any():
            continue
        nj, cj = nid[m], cos[m]
        order = np.lexsort((nj, -cj))[:k]
        out_q.append(np.repeat(q_ids_v[j], len(order)))
        out_n.append(nj[order])
        out_c.append(cj[order])
    if not out_q:
        return None
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_n),
            "cosine": np.concatenate(out_c),
        }
    )


def _rank_topk(cand: DataFrame, k: int) -> DataFrame:
    """Global top-k tail over the tiny candidate set: (cosine DESC,
    neighbor_id ASC) row_number per query — the one shuffle in every
    top-k operator here."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("int").alias("rank"), "cosine",
        )
    )


def _empty_topk(spark, id_type) -> DataFrame:
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("rank", T.IntegerType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    return spark.createDataFrame([], schema)


def _collect_queries(queries: DataFrame):
    """(q_ids, Q, qn) for a small query frame, or None when empty."""
    import numpy as np

    q_rows = queries.select(
        "vec_id", F.col("embedding").cast("array<double>")
    ).collect()
    if not q_rows:
        return None
    q_ids = np.array([r[0] for r in q_rows])
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qn = np.sqrt((Q * Q).sum(axis=1))
    return q_ids, Q, qn


def _ivf_probe_kernel(bc, k: int, from_index: bool):
    """The shared masked-probe kernel for both IVF paths. Rows whose
    cell no query probes are dropped BEFORE the query matmul — the
    probed fraction bounds the compute, not just the candidate set.
    ``from_index`` reads the stored assignment (partition column);
    otherwise the cell is assigned inline (rounded-cosine argmax; the
    FIRST maximal column over c_id-ascending columns = smallest
    centroid id, the same order the oracle's (cos DESC, c_id ASC)
    row_number uses)."""
    import numpy as np

    def probe_topk(batches):
        if from_index:
            c_ids_v, q_ids_v, Qt, qn_v, M_v = bc.value
        else:
            Ct, cn_v, q_ids_v, Qt, qn_v, M_v = bc.value
        pool: list = []
        for batch in batches:
            if not len(batch):
                continue
            ids = batch["vec_id"].to_numpy()
            B = np.stack(batch["embedding"].to_numpy())
            bn = np.sqrt((B * B).sum(axis=1))
            if from_index:
                # stored assignment → centroid COLUMN position
                cell_col = np.searchsorted(
                    c_ids_v, batch["ivf_cell"].to_numpy()
                )
            else:
                SC = np.round((B @ Ct) / (bn[:, None] * cn_v[None, :]), 6)
                cell_col = np.argmax(SC, axis=1)
            hit = M_v[cell_col, :]           # (rows × queries) probed mask
            live = hit.any(axis=1)
            if not live.any():
                continue
            ids, B, bn, hit = ids[live], B[live], bn[live], hit[live]
            S = np.round((B @ Qt) / (bn[:, None] * qn_v[None, :]), 6)
            S[~hit] = -np.inf                # not in a probed cell
            S[ids[:, None] == q_ids_v[None, :]] = -np.inf  # self-match
            if len(ids) > k:
                kth = np.partition(S, -k, axis=0)[-k, :]
                keep = (S >= kth[None, :]) & (S > -np.inf)
            else:
                keep = S > -np.inf
            rows, cols = np.nonzero(keep)
            if len(rows):
                pool.append((ids[rows], cols, S[rows, cols]))
        if not pool:
            return
        merged = _local_topk(pool, q_ids_v, k)
        if merged is not None:
            yield merged

    return probe_topk


def _cand_schema(id_type):
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             n_cells: int = IVF_CELLS, nprobe: int = IVF_NPROBE,
             centroids=None) -> DataFrame:
    """IVF-flat approximate top-k (the brief's named ANN scale path,
    alongside the LSH-banded variant): assign every corpus vector to
    its nearest centroid (one Arrow matmul per batch — map-only), then
    each query scans ONLY its ``nprobe`` nearest cells: rows outside
    every probed cell are dropped before the query matmul, so compute
    ∝ the probed fraction (~nprobe/n_cells) plus one small assignment
    matmul per batch. The corpus never shuffles; candidates
    (≤ partitions × n_q × k rows) are the only exchange. Ranking ties
    and centroid ties both break on id over 6-decimal-rounded cosines,
    so the assignment and result are parallelism- and
    engine-invariant.

    ``centroids``: pass a precomputed ``ivf_centroids`` result to skip
    the quantizer-selection job (a one-off per corpus — the bench
    hoists it out of the timed probe).

    At 10^12 vectors the assignment pass writes (vec_id, cell_id) once
    (cells ~ sqrt(N)), the probed fraction bounds each query's work,
    and cell-partitioned storage turns the probe into partition
    pruning — the standard IVF-flat layout (``ivf_index_write`` /
    ``ivf_topk_indexed`` below materialize exactly that)."""
    import numpy as np

    id_type = emb.schema["vec_id"].dataType
    c_ids, C = centroids if centroids is not None else ivf_centroids(emb, n_cells)
    qs = _collect_queries(queries)
    if qs is None or C is None:
        return _empty_topk(emb.sparkSession, id_type)
    q_ids, Q, qn = qs
    cn = np.sqrt((C * C).sum(axis=1))
    M = _probe_sets(Q, qn, C, cn, nprobe)

    bc = emb.sparkSession.sparkContext.broadcast(
        (C.T.copy(), cn, q_ids, Q.T.copy(), qn, M)
    )
    cand = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).mapInPandas(_ivf_probe_kernel(bc, k, from_index=False), _cand_schema(id_type))
    return _rank_topk(cand, k)


def ivf_assign(emb: DataFrame, n_cells: int = IVF_CELLS,
               centroids=None) -> DataFrame:
    """Input columns + ``ivf_cell`` (the assigned centroid's vec_id) —
    one map-only Arrow matmul per batch against the broadcast centroid
    matrix; zero shuffles. float32 embeddings are widened to float64
    BEFORE the matmul (exact widening), so the assignment is
    bit-identical to ivf_topk's inline JVM-cast path."""
    import numpy as np
    from pyspark.sql import types as T

    if centroids is None:
        centroids = ivf_centroids(emb, n_cells)
    c_ids, C = centroids
    if C is None:
        raise ValueError("ivf_assign: empty corpus has no centroids")
    cn = np.sqrt((C * C).sum(axis=1))
    bc = emb.sparkSession.sparkContext.broadcast((c_ids, C.T.copy(), cn))
    out_schema = T.StructType(
        list(emb.schema.fields)
        + [T.StructField("ivf_cell", emb.schema["vec_id"].dataType)]
    )

    def assign(batches):
        c_ids_v, Ct, cn_v = bc.value
        for batch in batches:
            if not len(batch):
                continue
            B = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            bn = np.sqrt((B * B).sum(axis=1))
            SC = np.round((B @ Ct) / (bn[:, None] * cn_v[None, :]), 6)
            out = batch.copy()
            # argmax = FIRST maximal column, columns c_id-ascending →
            # ties to the smallest centroid id (same as ivf_topk)
            out["ivf_cell"] = c_ids_v[np.argmax(SC, axis=1)]
            yield out

    return emb.mapInPandas(assign, out_schema)


def ivf_index_write(emb: DataFrame, path: str,
                    n_cells: int = IVF_CELLS) -> None:
    """Materialize the IVF-flat layout SCALE.md §8 describes: the
    corpus written ``partitionBy(ivf_cell)`` (one directory per coarse
    cell — the parquet stand-in for an Iceberg identity-partition on
    the cell column) plus a tiny centroid sidecar. A probe against
    this layout prunes non-probed cells at the FILE level: each query
    touches nprobe/n_cells of the data physically, not just logically."""
    spark = emb.sparkSession
    c_ids, C = ivf_centroids(emb, n_cells)
    if C is None:
        raise ValueError("ivf_index_write: empty corpus has no centroids")
    (
        ivf_assign(emb, centroids=(c_ids, C))
        # cluster the write: without this every input partition writes
        # a file into every cell dir (parts × cells tiny files — the
        # probe then pays per-file open cost instead of saving scan).
        # One hash shuffle on the cell key → ~one file per cell; at
        # 100 TB the same pass targets maxPartitionBytes-sized files
        # per cell (repartition(n, col) with n ∝ corpus/cell size).
        .repartition(F.col("ivf_cell"))
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(f"{path}/index")
    )
    cent_rows = [(int(cid), [float(x) for x in vec])
                 for cid, vec in zip(c_ids, C)]
    (
        spark.createDataFrame(cent_rows, "c_id long, cv array<double>")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/centroids")
    )


def ivf_index_append(new_emb: DataFrame, path: str) -> None:
    """Append a batch of new vectors to an existing ``ivf_index_write``
    layout — the growing-corpus maintenance path. The quantizer stays
    FROZEN: new vectors are assigned against the stored centroid
    sidecar (one map-only Arrow matmul), clustered on the cell key, and
    appended into the cell-partitioned directory — no shuffle or
    rewrite of existing data, which is what makes daily 10^9-vector
    appends to a 10^12-vector index affordable. Probes over the
    appended index are row-identical to a probe over a single-shot
    index of the union built with the same centroids (parity-tested);
    re-train + ``ivf_index_write`` periodically when quantizer drift
    (new data far from every centroid) degrades the probed-cell recall.
    """
    c_ids, C = _load_centroids(new_emb.sparkSession, path)
    (
        ivf_assign(new_emb, centroids=(c_ids, C))
        .repartition(F.col("ivf_cell"))
        .write.mode("append")
        .partitionBy("ivf_cell")
        .parquet(f"{path}/index")
    )


def _load_centroids(spark, path: str):
    """Centroid sidecar → (c_ids asc, matrix). Read driver-side with
    pyarrow when possible — it is a few KB and a Spark job just to
    fetch it costs ~0.3 s of scheduler overhead per probe call; the
    Spark reader remains the fallback for filesystems pyarrow cannot
    reach."""
    import numpy as np

    try:
        import pyarrow.dataset as ds

        t = ds.dataset(f"{path}/centroids", format="parquet").to_table()
        pdf = t.to_pandas().sort_values("c_id")
        c_ids = pdf["c_id"].to_numpy()
        C = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
    except Exception:  # noqa: BLE001 — non-local FS or pyarrow gap
        cent = spark.read.parquet(f"{path}/centroids").orderBy("c_id").collect()
        c_ids = np.array([r["c_id"] for r in cent])
        C = np.stack([np.asarray(r["cv"], dtype=np.float64) for r in cent])
    return c_ids, C


def _index_probe_state(spark, path: str, queries: DataFrame, nprobe: int):
    """Shared by ivf_probe_cells / ivf_topk_indexed: centroid sidecar +
    collected queries → (c_ids, q_ids, Q, qn, M, probed cell ids), or
    None when the query frame is empty."""
    import numpy as np

    c_ids, C = _load_centroids(spark, path)
    qs = _collect_queries(queries)
    if qs is None:
        return None
    q_ids, Q, qn = qs
    cn = np.sqrt((C * C).sum(axis=1))
    M = _probe_sets(Q, qn, C, cn, nprobe)
    probed = sorted(int(c_ids[c]) for c in np.nonzero(M.any(axis=1))[0])
    return c_ids, q_ids, Q, qn, M, probed


def ivf_probe_cells(spark, path: str, queries: DataFrame,
                    nprobe: int = IVF_NPROBE) -> list[int]:
    """The union of cell ids the given queries probe against an
    ``ivf_index_write`` layout — the partition list a planner (or an
    Iceberg scan-file API) would prune to. Shared with
    ``ivf_topk_indexed`` so tests can assert the physically-scanned
    file set matches exactly this list."""
    state = _index_probe_state(spark, path, queries, nprobe)
    return state[5] if state is not None else []


def ivf_topk_indexed(spark, path: str, queries: DataFrame, k: int = 5,
                     nprobe: int = IVF_NPROBE) -> DataFrame:
    """IVF probe over an ``ivf_index_write`` layout. The probe set is
    computed driver-side from the centroid sidecar, then the scan reads
    ONLY the probed cell partitions (``ivf_cell IN (...)`` compiles to
    PartitionFilters — partition pruning before any byte is read; the
    plan-shape test asserts the pruned file count). Output is
    row-identical to ``ivf_topk`` on the same corpus: same centroids,
    same rounded-cosine tie-breaks, and the stored assignment equals
    the inline one by construction."""
    import numpy as np

    id_type = queries.schema["vec_id"].dataType
    state = _index_probe_state(spark, path, queries, nprobe)
    if state is None:
        return _empty_topk(spark, id_type)
    c_ids, q_ids, Q, qn, M, probed = state

    idx = (
        spark.read.parquet(f"{path}/index")
        .filter(F.col("ivf_cell").isin(probed))
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
            F.col("ivf_cell").cast("long").alias("ivf_cell"),
        )
    )
    bc = spark.sparkContext.broadcast(
        (c_ids.astype(np.int64), q_ids, Q.T.copy(), qn, M)
    )
    cand = idx.mapInPandas(
        _ivf_probe_kernel(bc, k, from_index=True), _cand_schema(id_type)
    )
    return _rank_topk(cand, k)


def ivf_train_step(emb: DataFrame, n_cells: int = IVF_CELLS,
                   centroids=None) -> DataFrame:
    """One distributed Lloyd (k-means) refinement of the IVF coarse
    quantizer — the "periodic re-train" SCALE.md §8 prescribes for
    quantizer drift, as an engine operator instead of an offline
    assumption: assign every vector to its nearest current centroid,
    then emit the per-cell mean vector. Iterating this op IS k-means;
    one step is the common nightly refresh.

    Plan shape (100 TB): assignment is ivf_assign's map-only broadcast
    matmul (zero shuffles). The mean never ships vectors to a reducer:
    posexplode to (cell, dim, x) feeds a groupBy(cell, dim) whose
    map-side partial aggregation reduces each partition to at most
    cells × dims rows BEFORE the exchange — shuffle volume is bounded
    by (partitions × cells × dims), independent of corpus row count.
    Long output format (no arrays) keeps the value oracle exact.

    Output: (cell, dim, m, n_members) — m = round(avg, 6) of dimension
    ``dim`` over the cell's members, dim 0-based.
    """
    assigned = ivf_assign(emb, n_cells=n_cells, centroids=centroids).select(
        F.col("ivf_cell").alias("cell"),
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("dim", "x"),
    )
    return assigned.groupBy("cell", "dim").agg(
        F.round(F.avg("x"), 6).alias("m"),
        F.count(F.lit(1)).alias("n_members"),
    )


def sq8_scale(emb: DataFrame) -> float:
    """Global symmetric quantization scale: the corpus-wide max |x|
    over every embedding component — ONE map-combined aggregation to
    a single driver scalar (the same tiny-sidecar contract as the IVF
    centroid set)."""
    row = emb.select(
        F.max(
            F.aggregate(
                F.transform(
                    F.col("embedding").cast("array<double>"), F.abs
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            )
        ).alias("ma")
    ).collect()[0]
    return float(row["ma"] or 0.0)


def sq8_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             scale: float | None = None) -> DataFrame:
    """Symmetric-uniform int8 (SQ8) ANN top-k: every component is
    quantized to code = clamp(floor(x·127/max_abs + 0.5), −127, 127)
    with ONE corpus-global scale, candidates are ranked by the
    quantized cosine (integer dot product normalized by integer code
    norms), and the exact float64 cosine of the ORIGINAL vectors is
    reported for the winners — the compressed-read path of int8
    inference / FAISS-style scalar quantization: 4× less memory and
    scan bandwidth than float32, 8× less than float64.

    Why symmetric-uniform and not per-dimension affine: an affine
    offset (x − lo_j) breaks dot-product geometry — the cross terms
    lo·Σx dominate and ranking collapses to noise; one global
    symmetric scale preserves angles exactly up to quantization error
    (measured recall@5 vs exact cosine ≈ 1 on the test corpus).

    Cross-engine determinism: floor(t + 0.5) instead of round()
    (numpy rounds half-to-even, Java/DuckDB half-up); the quantized
    dot and code norms are EXACT integers, so qcos =
    round(dot/(√nq·√nc), 6) is the same IEEE expression in both
    engines; ties break on neighbor_id. Self-matches excluded.

    Scale shape (mirrors cosine_topk): scalar sidecar; per-partition
    Arrow kernel quantizes each batch and matmuls int codes against
    the quantized query matrix; per-partition top-k keeps ≤ n_q·k
    rows; ONE final shuffle ranks the tiny candidate set.

    Output: (query_id, neighbor_id, rank, score, qcos, cosine) —
    score the integer quantized dot, qcos the quantized cosine the
    ranking uses, cosine the exact refine value. ``scale`` lets the
    caller hoist the corpus max-abs sidecar out of repeated queries
    (the same convention as ivf_topk's ``centroids`` arg: the corpus
    pays the stats pass once, every query batch reuses it).
    """
    import numpy as np
    from pyspark.sql import types as T

    id_type = emb.schema["vec_id"].dataType
    ma = sq8_scale(emb) if scale is None else float(scale)

    def quantize(X: "np.ndarray") -> "np.ndarray":
        if ma <= 0.0:
            return np.zeros_like(X, dtype=np.int64)
        t = X * 127.0 / ma
        return np.clip(np.floor(t + 0.5), -127.0, 127.0).astype(np.int64)

    q_rows = queries.select(
        "vec_id", F.col("embedding").cast("array<double>")
    ).collect()
    if not q_rows:
        return _empty_topk(emb.sparkSession, id_type).select(
            "query_id", "neighbor_id", "rank",
            F.lit(0).cast("long").alias("score"),
            F.lit(0.0).alias("qcos"), "cosine",
        )
    q_ids = np.array([r[0] for r in q_rows])
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    Qc = quantize(Q)
    qn = np.sqrt((Q * Q).sum(axis=1))
    qcn = np.sqrt((Qc * Qc).sum(axis=1).astype(np.float64))
    bq = emb.sparkSession.sparkContext.broadcast(
        (q_ids, Qc.T.copy(), Q.T.copy(), qn, qcn)
    )

    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("score", T.LongType()),
            T.StructField("qcos", T.DoubleType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def part_topk(batches):
        import pandas as pd

        q_ids_v, QcT, QT, qn_v, qcn_v = bq.value
        pool: list = []
        for batch in batches:
            if not len(batch):
                continue
            ids = batch["vec_id"].to_numpy()
            B = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            Bc = quantize(B)
            S = Bc @ QcT
            bcn = np.sqrt((Bc * Bc).sum(axis=1).astype(np.float64))
            denom = bcn[:, None] * qcn_v[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                QS = np.round(np.where(denom > 0.0, S / denom, 0.0), 6)
            QS[ids[:, None] == q_ids_v[None, :]] = -np.inf  # self-matches
            if len(ids) > k:
                kth = np.partition(QS, -k, axis=0)[-k, :]
                keep = (QS >= kth[None, :]) & (QS > -np.inf)
            else:
                keep = QS > -np.inf
            rows, cols = np.nonzero(keep)
            if len(rows):
                bn = np.sqrt((B * B).sum(axis=1))
                cos = np.round(
                    (B[rows] * QT.T[cols]).sum(axis=1)
                    / (bn[rows] * qn_v[cols]), 6
                )
                pool.append(
                    (ids[rows], cols, S[rows, cols], QS[rows, cols], cos)
                )
        if not pool:
            return
        nid = np.concatenate([p[0] for p in pool])
        qcol = np.concatenate([p[1] for p in pool])
        sc = np.concatenate([p[2] for p in pool])
        qs = np.concatenate([p[3] for p in pool])
        cs = np.concatenate([p[4] for p in pool])
        out = {"query_id": [], "neighbor_id": [], "score": [],
               "qcos": [], "cosine": []}
        for j in range(len(q_ids_v)):
            m = qcol == j
            if not m.any():
                continue
            nj, sj, qj, cj = nid[m], sc[m], qs[m], cs[m]
            order = np.lexsort((nj, -qj))[:k]
            out["query_id"].extend([q_ids_v[j]] * len(order))
            out["neighbor_id"].extend(nj[order])
            out["score"].extend(sj[order])
            out["qcos"].extend(qj[order])
            out["cosine"].extend(cj[order])
        yield pd.DataFrame(out)

    cand = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).mapInPandas(part_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            "score", "qcos", "cosine",
        )
    )


def sq8_encode(emb: DataFrame, path: str, scale: float | None = None) -> float:
    """Materialize the SQ8 compressed layout: the corpus stored as
    int8 codes (one byte per dimension — ~4× smaller on disk and on
    the scan path than float32, ~8× than float64) plus the scalar
    scale as a one-row sidecar. This is the deployment shape of
    scalar quantization: encode ONCE at corpus-build time, serve
    every query from the code scan; sq8_topk's per-query
    re-quantization of the float corpus is only the zero-setup
    fallback. Returns the scale used."""
    spark = emb.sparkSession
    ma = sq8_scale(emb) if scale is None else float(scale)
    factor = F.lit(127.0 / ma) if ma > 0.0 else F.lit(0.0)
    codes = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.least(
            F.greatest(F.floor(x * factor + F.lit(0.5)), F.lit(-127.0)),
            F.lit(127.0),
        ).cast("tinyint"),
    )
    emb.select("vec_id", codes.alias("codes")).write.mode(
        "overwrite"
    ).parquet(f"{path}/codes")
    spark.createDataFrame([(ma,)], "ma double").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/scale")
    return ma


def sq8_topk_encoded(spark, path: str, queries: DataFrame,
                     k: int = 5) -> DataFrame:
    """ANN top-k against a stored sq8_encode layout: the corpus scan
    reads ONLY the one-byte-per-dimension code column (the 4×/8×
    bandwidth saving is physical, not just arithmetic), queries are
    quantized with the stored scale sidecar, and ranking is the same
    integer-exact quantized cosine as sq8_topk. No float corpus is
    touched, so the output is (query_id, neighbor_id, rank, score,
    qcos) — exact-cosine refine joins the winners back to the float
    table when the caller needs it (tiny: ≤ n_q·k rows).

    Engine-exactness matches sq8_topk: the stored codes were produced
    by the same floor(t+0.5) rule, and scoring is integer dot +
    integer code norms."""
    import numpy as np
    from pyspark.sql import types as T

    ma = float(
        spark.read.parquet(f"{path}/scale").collect()[0]["ma"]
    )
    corpus = spark.read.parquet(f"{path}/codes")
    id_type = corpus.schema["vec_id"].dataType

    q_rows = queries.select(
        "vec_id", F.col("embedding").cast("array<double>")
    ).collect()
    if not q_rows:
        return _empty_topk(spark, id_type).select(
            "query_id", "neighbor_id", "rank",
            F.lit(0).cast("long").alias("score"),
            F.lit(0.0).alias("qcos"),
        )
    q_ids = np.array([r[0] for r in q_rows])
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    if ma > 0.0:
        Qc = np.clip(
            np.floor(Q * 127.0 / ma + 0.5), -127.0, 127.0
        ).astype(np.int64)
    else:
        Qc = np.zeros_like(Q, dtype=np.int64)
    qcn = np.sqrt((Qc * Qc).sum(axis=1).astype(np.float64))
    bq = spark.sparkContext.broadcast((q_ids, Qc.T.copy(), qcn))

    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("score", T.LongType()),
            T.StructField("qcos", T.DoubleType()),
        ]
    )

    def part_topk(batches):
        import pandas as pd

        q_ids_v, QcT, qcn_v = bq.value
        pool: list = []
        for batch in batches:
            if not len(batch):
                continue
            ids = batch["vec_id"].to_numpy()
            Bc = np.stack(batch["codes"].to_numpy()).astype(np.int64)
            S = Bc @ QcT
            bcn = np.sqrt((Bc * Bc).sum(axis=1).astype(np.float64))
            denom = bcn[:, None] * qcn_v[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                QS = np.round(np.where(denom > 0.0, S / denom, 0.0), 6)
            QS[ids[:, None] == q_ids_v[None, :]] = -np.inf
            if len(ids) > k:
                kth = np.partition(QS, -k, axis=0)[-k, :]
                keep = (QS >= kth[None, :]) & (QS > -np.inf)
            else:
                keep = QS > -np.inf
            rows, cols = np.nonzero(keep)
            if len(rows):
                pool.append((ids[rows], cols, S[rows, cols], QS[rows, cols]))
        if not pool:
            return
        nid = np.concatenate([p[0] for p in pool])
        qcol = np.concatenate([p[1] for p in pool])
        sc = np.concatenate([p[2] for p in pool])
        qs = np.concatenate([p[3] for p in pool])
        out = {"query_id": [], "neighbor_id": [], "score": [], "qcos": []}
        for j in range(len(q_ids_v)):
            m = qcol == j
            if not m.any():
                continue
            nj, sj, qj = nid[m], sc[m], qs[m]
            order = np.lexsort((nj, -qj))[:k]
            out["query_id"].extend([q_ids_v[j]] * len(order))
            out["neighbor_id"].extend(nj[order])
            out["score"].extend(sj[order])
            out["qcos"].extend(qj[order])
        yield pd.DataFrame(out)

    cand = corpus.mapInPandas(part_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("int").alias("rank"), "score", "qcos",
        )
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric-distance (ADC) search
# --------------------------------------------------------------------------
#
# The third compression point in the ANN family (exact float -> SQ8
# int8 -> PQ): each vector is split into PQ_M subvectors and each
# subvector replaced by the index of its nearest sub-codebook centroid
# (Jegou et al. 2011). Storage per vector is PQ_M bytes -- 64x smaller
# than float64 at d=64/m=8 -- and search never reconstructs vectors:
# the query precomputes a (m x ksub) lookup table of subvector
# distances and every corpus code scores as m integer table lookups.
#
# Cross-engine exactness (the same discipline as SQ8/hyperplane-LSH):
# every per-dimension squared difference is quantized independently --
# floor((v_i - c_i)^2 * 1e12 + 0.5) -> BIGINT -- so sub-distances,
# code assignment (argmin, ties to the smaller centroid index) and the
# final ADC score are all INTEGER sums whose value cannot depend on
# summation order (numpy pairwise vs SQL sequential). The only float
# ops are the subtraction (exact: both operands are float32-exact
# doubles) and one correctly-rounded square+scale per dimension.
#
# The codebook is the ivf_centroids seeded sample (the ksub corpus
# vectors with smallest md5(vec_id), sliced per subspace) -- closed
# form for the value oracle; pq_train_step below is the Lloyd
# refinement a production build would iterate, same plan either way.

PQ_M = 8     # subspaces; d must be divisible by m
PQ_K = 16    # centroids per sub-codebook (4-bit codes)


def pq_codebook(emb: DataFrame, m: int = PQ_M, ksub: int = PQ_K):
    """Deterministic sub-codebooks: (sample_ids, CB) with CB shaped
    (m, ksub, d/m); centroid index = rank of the sample row by vec_id
    ascending (the oracle's ROW_NUMBER() OVER (ORDER BY vec_id) - 1).
    (empty, None) for an empty corpus."""
    c_ids, C = ivf_centroids(emb, ksub)
    if C is None:
        return c_ids, None
    d = C.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    CB = C.reshape(C.shape[0], m, dsub).transpose(1, 0, 2).copy()
    return c_ids, CB


def _pq_sqdist_q(X, CB, s):
    """Integer-quantized squared distances of X's subspace s rows to
    sub-codebook s: (n, ksub) int64, each per-dimension term floored
    independently (see module comment)."""
    import numpy as np

    dsub = CB.shape[2]
    sub = X[:, s * dsub:(s + 1) * dsub]
    diff = sub[:, None, :] - CB[s][None, :, :]
    return np.floor(diff * diff * 1e12 + 0.5).astype(np.int64).sum(axis=2)


def _pq_codes(X, CB):
    """(n, m) uint8 codes: per subspace argmin of the quantized
    sub-distance; np.argmin takes the FIRST minimum = smallest
    centroid index, matching the oracle's (dq ASC, cidx ASC) rank."""
    import numpy as np

    m = CB.shape[0]
    return np.stack(
        [np.argmin(_pq_sqdist_q(X, CB, s), axis=1) for s in range(m)],
        axis=1,
    ).astype(np.uint8)


def pq_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
            codebook=None) -> DataFrame:
    """ADC top-k against inline-encoded embeddings: corpus rows are
    PQ-encoded on the fly (zero-setup path; pq_encode/pq_topk_encoded
    below is the deployment shape where codes are stored), queries
    build the integer LUT once, and ranking is (adist ASC,
    neighbor_id ASC) over exact integer scores. Self-matches excluded.

    Scale shape (mirrors sq8_topk): the LUT broadcast is
    n_q x m x ksub int64 (tiny); the per-partition Arrow kernel
    encodes its batch and scores via m gathers; per-partition top-k
    keeps <= n_q*k rows; ONE final shuffle ranks the candidates.

    Output: (query_id, neighbor_id, rank, adist)."""
    import numpy as np
    from pyspark.sql import types as T

    id_type = emb.schema["vec_id"].dataType
    if codebook is None:
        _, codebook = pq_codebook(emb)
    CB = codebook
    q = _collect_queries(queries)
    empty = lambda: _empty_topk(emb.sparkSession, id_type).select(  # noqa: E731
        "query_id", "neighbor_id", "rank",
        F.lit(0).cast("long").alias("adist"),
    )
    if q is None or CB is None:
        return empty()
    q_ids, Q, _ = q
    m = CB.shape[0]
    LUT = np.stack([_pq_sqdist_q(Q, CB, s) for s in range(m)], axis=1)
    bq = emb.sparkSession.sparkContext.broadcast((q_ids, LUT, CB))

    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("adist", T.LongType()),
        ]
    )

    def part_topk(batches):
        import pandas as pd

        q_ids_v, LUT_v, CB_v = bq.value
        m_v = CB_v.shape[0]
        pool: list = []
        for batch in batches:
            if not len(batch):
                continue
            ids = batch["vec_id"].to_numpy()
            X = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            codes = _pq_codes(X, CB_v)
            # adist[n, q] = sum_s LUT[q, s, codes[n, s]]
            adist = np.zeros((len(ids), len(q_ids_v)), dtype=np.int64)
            for s in range(m_v):
                adist += LUT_v[:, s, :].T[codes[:, s]]
            mask = ids[:, None] == q_ids_v[None, :]
            if len(ids) > k:
                kth = np.partition(
                    np.where(mask, np.iinfo(np.int64).max, adist), k - 1, axis=0
                )[k - 1, :]
                keep = (adist <= kth[None, :]) & ~mask
            else:
                keep = ~mask
            rows, cols = np.nonzero(keep)
            if len(rows):
                pool.append((ids[rows], cols, adist[rows, cols]))
        if not pool:
            return
        nid = np.concatenate([p[0] for p in pool])
        qcol = np.concatenate([p[1] for p in pool])
        sc = np.concatenate([p[2] for p in pool])
        out = {"query_id": [], "neighbor_id": [], "adist": []}
        for j in range(len(q_ids_v)):
            sel = qcol == j
            if not sel.any():
                continue
            nj, sj = nid[sel], sc[sel]
            order = np.lexsort((nj, sj))[:k]
            out["query_id"].extend([q_ids_v[j]] * len(order))
            out["neighbor_id"].extend(nj[order])
            out["adist"].extend(sj[order])
        yield pd.DataFrame(out)

    cand = emb.select("vec_id", "embedding").mapInPandas(part_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("int").alias("rank"), "adist",
        )
    )


def pq_encode(emb: DataFrame, path: str, codebook=None) -> None:
    """Materialize the PQ compressed layout: codes (PQ_M bytes per
    vector — at d=64 that is 64× smaller than float64 on the scan
    path) plus the sub-codebooks as a tiny sidecar table
    (s, cidx, cv). Encode ONCE at corpus-build time; every query is
    served from the code scan by pq_topk_encoded."""
    import pandas as pd
    from pyspark.sql import types as T

    spark = emb.sparkSession
    if codebook is None:
        _, codebook = pq_codebook(emb)
    CB = codebook
    if CB is None:
        raise ValueError("empty corpus: no codebook")
    if CB.shape[1] > 128:
        raise ValueError("ksub > 128 does not fit the tinyint code layout")
    bcb = spark.sparkContext.broadcast(CB)
    id_type = emb.schema["vec_id"].dataType
    out_schema = T.StructType(
        [
            T.StructField("vec_id", id_type),
            T.StructField("codes", T.ArrayType(T.ByteType())),
        ]
    )

    def encode(batches):
        import numpy as np

        CB_v = bcb.value
        for batch in batches:
            if not len(batch):
                continue
            X = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            codes = _pq_codes(X, CB_v).astype(np.int8)
            yield pd.DataFrame(
                {"vec_id": batch["vec_id"], "codes": list(codes)}
            )

    emb.select("vec_id", "embedding").mapInPandas(encode, out_schema).write.mode(
        "overwrite"
    ).parquet(f"{path}/codes")
    rows = [
        (int(s), int(j), [float(x) for x in CB[s, j]])
        for s in range(CB.shape[0])
        for j in range(CB.shape[1])
    ]
    spark.createDataFrame(
        rows, "s int, cidx int, cv array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebook")


def pq_topk_encoded(spark, path: str, queries: DataFrame,
                    k: int = 5) -> DataFrame:
    """ADC top-k against a stored pq_encode layout: the corpus scan
    reads ONLY the m-byte code column, the codebook sidecar rebuilds
    the LUT driver-side, and scoring/ranking matches pq_topk exactly
    (stored codes came from the same argmin rule)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cb_rows = spark.read.parquet(f"{path}/codebook").collect()
    cb_rows.sort(key=lambda r: (r["s"], r["cidx"]))
    m = 1 + max(r["s"] for r in cb_rows)
    ksub = 1 + max(r["cidx"] for r in cb_rows)
    dsub = len(cb_rows[0]["cv"])
    CB = np.array([r["cv"] for r in cb_rows], dtype=np.float64).reshape(
        m, ksub, dsub
    )
    corpus = spark.read.parquet(f"{path}/codes")
    id_type = corpus.schema["vec_id"].dataType
    q = _collect_queries(queries)
    if q is None:
        return _empty_topk(spark, id_type).select(
            "query_id", "neighbor_id", "rank",
            F.lit(0).cast("long").alias("adist"),
        )
    q_ids, Q, _ = q
    LUT = np.stack([_pq_sqdist_q(Q, CB, s) for s in range(m)], axis=1)
    bq = spark.sparkContext.broadcast((q_ids, LUT, m))

    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("adist", T.LongType()),
        ]
    )

    def part_topk(batches):
        q_ids_v, LUT_v, m_v = bq.value
        pool: list = []
        for batch in batches:
            if not len(batch):
                continue
            ids = batch["vec_id"].to_numpy()
            codes = np.stack(batch["codes"].to_numpy()).astype(np.int64)
            adist = np.zeros((len(ids), len(q_ids_v)), dtype=np.int64)
            for s in range(m_v):
                adist += LUT_v[:, s, :].T[codes[:, s]]
            mask = ids[:, None] == q_ids_v[None, :]
            if len(ids) > k:
                kth = np.partition(
                    np.where(mask, np.iinfo(np.int64).max, adist), k - 1, axis=0
                )[k - 1, :]
                keep = (adist <= kth[None, :]) & ~mask
            else:
                keep = ~mask
            rows, cols = np.nonzero(keep)
            if len(rows):
                pool.append((ids[rows], cols, adist[rows, cols]))
        if not pool:
            return
        nid = np.concatenate([p[0] for p in pool])
        qcol = np.concatenate([p[1] for p in pool])
        sc = np.concatenate([p[2] for p in pool])
        out = {"query_id": [], "neighbor_id": [], "adist": []}
        for j in range(len(q_ids_v)):
            sel = qcol == j
            if not sel.any():
                continue
            nj, sj = nid[sel], sc[sel]
            order = np.lexsort((nj, sj))[:k]
            out["query_id"].extend([q_ids_v[j]] * len(order))
            out["neighbor_id"].extend(nj[order])
            out["adist"].extend(sj[order])
        yield pd.DataFrame(out)

    cand = corpus.mapInPandas(part_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("int").alias("rank"), "adist",
        )
    )


def pq_topk_refined(emb: DataFrame, queries: DataFrame, k: int = 5,
                    r: int = 50, codebook=None) -> DataFrame:
    """PQ + refine (the FAISS ``IndexRefineFlat`` shape): the ADC scan
    shortlists ``r`` candidates per query from codes alone, then the
    EXACT float64 squared-L2 of the original vectors reranks the
    shortlist to top-k. This is the honest production contract for PQ
    on hard (clusterless) data: the isotropic-Gaussian test corpus is
    PQ's worst case — raw ADC@5 recall is ~0.2 there (measured,
    trained or not) — while the r/k refine multiplier buys recall
    back (measured on sf0.01/2k vectors: 0.55 @ r=50, 0.75 @ r=100,
    0.91 @ r=200) at a cost of n_q·r exact distance evaluations (a
    candidate-pruned hash join, NOT a corpus scan of float vectors —
    the float table is touched only for shortlisted rows).

    Output: (query_id, neighbor_id, rank, l2) ranked by
    (l2 ASC, neighbor_id ASC), l2 rounded to 6 dp."""
    cand = pq_topk(emb, queries, k=r, codebook=codebook).select(
        "query_id", "neighbor_id"
    )
    qv = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    nv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("nv"),
    )
    # candidate set is n_q*r rows -> broadcast it against the float
    # table so the rerank reads each shortlisted vector once
    scored = (
        nv.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "neighbor_id",
            F.round(
                F.aggregate(
                    F.zip_with(
                        "qv", "nv", lambda x, y: (x - y) * (x - y)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("l2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("l2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("int").alias("rank"), "l2",
        )
    )


def pq_train_step(emb: DataFrame, codebook=None) -> DataFrame:
    """One distributed Lloyd refinement of the PQ sub-codebooks (the
    per-subspace analogue of ivf_train_step — iterate for k-means,
    one step is the nightly quantizer refresh): assign every vector's
    m subvectors to their current nearest sub-centroids with the
    integer-exact rule pq_topk encodes with, then emit each
    (subspace, centroid, dim)'s member mean.

    Plan shape (100 TB): assignment is the broadcast-codebook Arrow
    kernel — zero shuffles; the kernel emits (s, cidx, dim, x) long
    rows (m·dsub = d rows per vector, same fan-out as ivf_train_step's
    posexplode) into ONE map-combined groupBy whose key space is
    m × ksub × dsub (= 1024 at the defaults) — shuffle volume bounded
    by partitions × keys, independent of corpus rows.

    Output: (s, cidx, dim, m, n_members) — dim 0-based WITHIN the
    subspace, m = round(avg, 6)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if codebook is None:
        _, codebook = pq_codebook(emb)
    CB = codebook
    if CB is None:
        raise ValueError("empty corpus: no codebook")
    bcb = emb.sparkSession.sparkContext.broadcast(CB)
    out_schema = T.StructType(
        [
            T.StructField("s", T.IntegerType()),
            T.StructField("cidx", T.IntegerType()),
            T.StructField("dim", T.IntegerType()),
            T.StructField("x", T.DoubleType()),
        ]
    )

    def assign(batches):
        CB_v = bcb.value
        m, _, dsub = CB_v.shape
        for batch in batches:
            if not len(batch):
                continue
            X = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            codes = _pq_codes(X, CB_v)
            n = len(X)
            yield pd.DataFrame(
                {
                    "s": np.repeat(np.tile(np.arange(m, dtype=np.int32), n),
                                   dsub),
                    "cidx": np.repeat(codes.reshape(-1).astype(np.int32),
                                      dsub),
                    "dim": np.tile(np.arange(dsub, dtype=np.int32), n * m),
                    "x": X.reshape(n, m, dsub).reshape(-1),
                }
            )

    rows = emb.select("embedding").mapInPandas(assign, out_schema)
    return rows.groupBy("s", "cidx", "dim").agg(
        F.round(F.avg("x"), 6).alias("m"),
        F.count(F.lit(1)).alias("n_members"),
    )


def hard_negatives(emb: DataFrame, queries: DataFrame, k: int = 5,
                   shortlist: int = 20,
                   dup_threshold: float = 0.3) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k most-similar corpus vectors that are NOT near-duplicates —
    the highest-value negatives (hard because similar, safe because
    verified non-dup). Composes the engine's own primitives: an exact
    cosine shortlist (at 10^12 vectors: swap in ivf_topk/pq_refined —
    same output contract) anti-joined against the banded-hyperplane
    near-dup pairs, then re-ranked.

    Plan shape: the shortlist op does the corpus work (broadcast
    query matmul, candidates-only shuffle); the dup filter is an
    anti-join of the ≤ n_q·shortlist candidate rows against the dup
    pair set keyed (query, neighbor) — both orientations of the
    undirected pairs are probed; the final window re-ranks candidate
    rows only. Self-matches are already excluded by the shortlist.

    Output: (query_id, neighbor_id, rank, cosine)."""
    dups = embedding_near_dups(emb, threshold=dup_threshold)
    both = dups.select(
        F.col("vec_a").alias("x"), F.col("vec_b").alias("y")
    ).unionByName(
        dups.select(F.col("vec_b").alias("x"), F.col("vec_a").alias("y"))
    )
    cand = cosine_topk(emb, queries, k=shortlist)
    kept = cand.join(
        both,
        (cand["query_id"] == both["x"]) & (cand["neighbor_id"] == both["y"]),
        "left_anti",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        kept.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("int").alias("rank"), "cosine",
        )
    )


def ivfpq_index_write(emb: DataFrame, path: str,
                      n_cells: int = IVF_CELLS, codebook=None) -> None:
    """Materialize the IVF-PQ layout — THE 10^12-vector serving shape
    (FAISS IVFPQ): corpus coarse-partitioned by IVF cell (file-level
    partition pruning at probe time, exactly like ivf_index_write) and
    each row stored as PQ_M one-byte codes instead of floats, so a
    probe reads nprobe/n_cells of the data AND each touched row is
    ~64× narrower. Sidecars: the coarse centroids and the
    sub-codebooks. Both quantizers are the deterministic seeded
    samples (swap in trained ones — pq_train_step / ivf_train_step —
    without changing any layout or probe code)."""
    import pandas as pd
    from pyspark.sql import types as T

    spark = emb.sparkSession
    c_ids, C = ivf_centroids(emb, n_cells)
    if C is None:
        raise ValueError("ivfpq_index_write: empty corpus")
    if codebook is None:
        _, codebook = pq_codebook(emb)
    CB = codebook
    if CB.shape[1] > 128:
        raise ValueError("ksub > 128 does not fit the tinyint code layout")
    assigned = ivf_assign(emb, n_cells=n_cells, centroids=(c_ids, C))
    bcb = spark.sparkContext.broadcast(CB)
    id_type = emb.schema["vec_id"].dataType
    out_schema = T.StructType(
        [
            T.StructField("vec_id", id_type),
            T.StructField("codes", T.ArrayType(T.ByteType())),
            T.StructField("ivf_cell", T.LongType()),
        ]
    )

    def encode(batches):
        import numpy as np

        CB_v = bcb.value
        for batch in batches:
            if not len(batch):
                continue
            X = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            codes = _pq_codes(X, CB_v).astype(np.int8)
            yield pd.DataFrame(
                {
                    "vec_id": batch["vec_id"],
                    "codes": list(codes),
                    "ivf_cell": batch["ivf_cell"].astype("int64"),
                }
            )

    (
        assigned.select("vec_id", "embedding", "ivf_cell")
        .mapInPandas(encode, out_schema)
        .repartition(F.col("ivf_cell"))
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(f"{path}/index")
    )
    cent_rows = [(int(cid), [float(x) for x in vec])
                 for cid, vec in zip(c_ids, C)]
    spark.createDataFrame(
        cent_rows, "c_id long, cv array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    cb_rows = [
        (int(s), int(j), [float(x) for x in CB[s, j]])
        for s in range(CB.shape[0])
        for j in range(CB.shape[1])
    ]
    spark.createDataFrame(
        cb_rows, "s int, cidx int, cv array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebook")


def ivfpq_topk(spark, path: str, queries: DataFrame, k: int = 5,
               nprobe: int = IVF_NPROBE,
               refine_from: DataFrame | None = None,
               refine_k: int | None = None) -> DataFrame:
    """IVF-PQ probe: nprobe nearest cells per query (same rounded-
    cosine probe order as ivf_topk_indexed — the cell filter compiles
    to PartitionFilters, file-level pruning), then integer-LUT ADC
    over the probed cells' CODE column only. With ``refine_from`` (the
    float corpus table) the ADC shortlist of ``refine_k`` (default
    4·k) candidates is re-ranked by exact float64 squared-L2 via a
    broadcast candidate join — the IVFPQ+refine serving stack.

    Output without refine: (query_id, neighbor_id, rank, adist);
    with refine: (query_id, neighbor_id, rank, l2)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    c_ids, C = _load_centroids(spark, path)
    cb_rows = spark.read.parquet(f"{path}/codebook").collect()
    cb_rows.sort(key=lambda r: (r["s"], r["cidx"]))
    m = 1 + max(r["s"] for r in cb_rows)
    ksub = 1 + max(r["cidx"] for r in cb_rows)
    dsub = len(cb_rows[0]["cv"])
    CB = np.array([r["cv"] for r in cb_rows], dtype=np.float64).reshape(
        m, ksub, dsub
    )
    corpus = spark.read.parquet(f"{path}/index")
    id_type = corpus.schema["vec_id"].dataType
    q = _collect_queries(queries)
    if q is None:
        return _empty_topk(spark, id_type).select(
            "query_id", "neighbor_id", "rank",
            F.lit(0).cast("long").alias("adist"),
        )
    q_ids, Q, qn = q
    cn = np.sqrt((C * C).sum(axis=1))
    M = _probe_sets(Q, qn, C, cn, nprobe)          # M[cell_col, query]
    probed_cells = sorted(int(c_ids[ci]) for ci in np.nonzero(M.any(axis=1))[0])
    cell_col_of = {int(cid): ci for ci, cid in enumerate(c_ids)}
    LUT = np.stack([_pq_sqdist_q(Q, CB, s) for s in range(m)], axis=1)
    kk = k if refine_from is None else (refine_k or 4 * k)
    bq = spark.sparkContext.broadcast((q_ids, LUT, M, cell_col_of, m))

    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("adist", T.LongType()),
        ]
    )

    def part_topk(batches):
        q_ids_v, LUT_v, M_v, col_of, m_v = bq.value
        pool: list = []
        for batch in batches:
            if not len(batch):
                continue
            ids = batch["vec_id"].to_numpy()
            codes = np.stack(batch["codes"].to_numpy()).astype(np.int64)
            cells = batch["ivf_cell"].to_numpy()
            adist = np.zeros((len(ids), len(q_ids_v)), dtype=np.int64)
            for s in range(m_v):
                adist += LUT_v[:, s, :].T[codes[:, s]]
            cell_cols = np.array([col_of[int(c)] for c in cells])
            allowed = M_v[cell_cols, :]            # (n, n_q)
            allowed &= ids[:, None] != q_ids_v[None, :]
            big = np.iinfo(np.int64).max
            masked = np.where(allowed, adist, big)
            if len(ids) > kk:
                kth = np.partition(masked, kk - 1, axis=0)[kk - 1, :]
                keep = (masked <= kth[None, :]) & allowed
            else:
                keep = allowed
            rows, cols = np.nonzero(keep)
            if len(rows):
                pool.append((ids[rows], cols, adist[rows, cols]))
        if not pool:
            return
        nid = np.concatenate([p[0] for p in pool])
        qcol = np.concatenate([p[1] for p in pool])
        sc = np.concatenate([p[2] for p in pool])
        out = {"query_id": [], "neighbor_id": [], "adist": []}
        for j in range(len(q_ids_v)):
            sel = qcol == j
            if not sel.any():
                continue
            nj, sj = nid[sel], sc[sel]
            order = np.lexsort((nj, sj))[:kk]
            out["query_id"].extend([q_ids_v[j]] * len(order))
            out["neighbor_id"].extend(nj[order])
            out["adist"].extend(sj[order])
        yield pd.DataFrame(out)

    cand = corpus.filter(F.col("ivf_cell").isin(probed_cells)).mapInPandas(
        part_topk, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
    )
    if refine_from is None:
        return shortlist.select(
            "query_id", "neighbor_id",
            F.col("rank").cast("int").alias("rank"), "adist",
        )
    qv = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    nv = refine_from.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("nv"),
    )
    scored = (
        nv.join(F.broadcast(shortlist.select("query_id", "neighbor_id")),
                "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "neighbor_id",
            F.round(
                F.aggregate(
                    F.zip_with("qv", "nv", lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("l2"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("l2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("int").alias("rank"), "l2",
        )
    )


def semdedup(emb: DataFrame, threshold: float = 0.95,
             n_cells: int = IVF_CELLS, centroids=None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster-scoped
    semantic dedup — embeddings are coarse-clustered (the shared IVF
    quantizer), pairwise cosine runs ONLY within a cluster, and a
    vector is dropped when a ≥ threshold neighbor with a SMALLER id
    shares its cluster. The smaller-id keep rule is the paper's
    one-representative-per-duplicate-group pruning made deterministic
    by a total order (id ASC) — engine-portable, parallelism-
    invariant, append-unstable only in the ids themselves.

    Plan shape (why this is the web-scale semantic-dedup design):
      1. cluster assignment is ivf_assign's zero-shuffle broadcast
         matmul (map-only Arrow pass, bit-identical to the oracle's
         rounded-cosine argmax with ties to the smaller centroid id);
      2. ONE shuffle keys the within-cell self-join by ivf_cell; the
         quadratic lives INSIDE a cell — the whole point of SemDeDup's
         clustering is bounding pairwise work to E[|cell|] = N/k per
         cell (N²/k total pair evaluations instead of N²); at 10^12
         vectors raise n_cells so cells stay ~10^5 rows, exactly the
         paper's k scaling, and AQE splits any skewed cell key across
         tasks (a join key is splittable; a window partition is not —
         same reasoning as boilerplate_removal);
      3. the ≥ threshold hits aggregate map-combined to one row per
         dropped vector; the keep flag is a left join against that
         tiny frame.
    Cosines round to 6 dp (the engine-wide float-parity idiom).

    Output: (vec_id, ivf_cell, keep, max_sim_smaller) — one row per
    input vector; keep = 1 iff no same-cell ≥ threshold neighbor with
    a smaller id exists; max_sim_smaller = the strongest such
    neighbor's cosine (NULL when keep = 1). Zero-norm vectors have no
    defined cosine and so join no pairs: they always come back keep=1.
    """
    e, pairs = _semdedup_pairs(emb, threshold, n_cells, centroids)
    hits = (
        pairs.select(F.col("doc_b").alias("vec_id"), "cos")
        .groupBy("vec_id")
        .agg(F.max("cos").alias("max_sim_smaller"))
    )
    return (
        e.select("vec_id", "ivf_cell")
        .join(hits, "vec_id", "left")
        .select(
            "vec_id", "ivf_cell",
            F.when(F.col("max_sim_smaller").isNull(), F.lit(1))
            .otherwise(F.lit(0)).cast("int").alias("keep"),
            "max_sim_smaller",
        )
    )


def _semdedup_pairs(emb: DataFrame, threshold: float, n_cells: int,
                    centroids) -> tuple[DataFrame, DataFrame]:
    """SemDeDup's shared pair stage: (e, pairs). ``e`` is the
    localCheckpointed (vec_id, ivf_cell, v, norm) spine over ALL
    vectors; ``pairs`` the within-cell (doc_a < doc_b, cos) rows at
    cosine ≥ threshold. One implementation feeds both the chain-rule
    ``semdedup`` and the component-scoped ``semdedup_keep_best`` so
    the candidate semantics can never drift between them."""
    assigned = ivf_assign(
        emb.select("vec_id", "embedding"), n_cells, centroids
    )
    e = assigned.select(
        "vec_id", "ivf_cell",
        F.col("embedding").cast("array<double>").alias("v"),
        F.sqrt(
            F.aggregate(
                F.col("embedding").cast("array<double>"),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
        ).alias("norm"),
    )
    # the assignment matmul is map-only (no exchange for Catalyst to
    # reuse) and e feeds THREE consumers (both self-join sides + the
    # final keep-flag spine) — without materialization the Arrow
    # assignment pass runs 3x per action (review r3). localCheckpoint
    # computes it once; at index scale the same role is played by the
    # persisted ivf_index_write layout.
    e = e.localCheckpoint()
    # zero-norm vectors (empty-document embeddings) have no defined
    # cosine: exclude them from BOTH pairwise sides — under the ANSI
    # runtime a single zero vector otherwise aborts the stage with
    # DIVIDE_BY_ZERO — and let the left-join spine keep them (keep=1,
    # max_sim_smaller NULL), the only semantics that can't drop data
    pos = e.filter(F.col("norm") > 0)
    a = pos.alias("a")
    b = pos.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, p: acc + p,
    )
    cos = F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6)
    pairs = (
        a.join(
            b,
            (F.col("a.ivf_cell") == F.col("b.ivf_cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("doc_a"),
            F.col("b.vec_id").alias("doc_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    return e, pairs


def semdedup_keep_best(emb: DataFrame, scores: DataFrame,
                       threshold: float = 0.95, n_cells: int = IVF_CELLS,
                       centroids=None,
                       score_col: str = "quality") -> DataFrame:
    """SemDeDup with the paper's keep-BEST representative (Abbas et
    al. 2023 keep one representative per duplicate group; when a
    quality signal exists the kept member should be the best one, not
    the smallest id). Composes three live primitives:

      1. the shared SemDeDup pair stage (`_semdedup_pairs`: within-
         IVF-cell cosine ≥ threshold — the N²/k-bounded quadratic);
      2. `dedup_clusters`' connected components over those pairs —
         the chain rule of plain ``semdedup`` keeps min-id per chain
         only implicitly; the closure makes the duplicate GROUP
         explicit (transitive: A~B~C is one group even when A~C is
         below threshold) so a representative exists per group;
      3. `keep_best_per_cluster`: keeper = argmax(``score_col``),
         ties to the smaller vec_id — overriding the smallest-id rule
         with the score, exactly the flip this operator exists for.

    ``scores``: (vec_id, <score_col>) — any quality signal (model
    score, heuristic quality, recency), PARTIAL coverage allowed:
    unscored vectors survive with a NULL score and rank below every
    scored cluster member (keep_best_per_cluster's left-join
    contract), so a cluster scored nowhere still keeps its smallest
    id. Singletons (no ≥-threshold neighbor, including zero-norm
    vectors) are their own cluster and always keep=1.

    Plan shape: the pair stage and closure are the audited semdedup /
    dedup_clusters plans; the keeper adds one equi-join + one window
    over high-cardinality cluster ids (no hot key).

    Output: (vec_id, cluster_id, <score_col>, keep) — one keep=1 row
    per cluster.
    """
    from .dedup import dedup_clusters, keep_best_per_cluster

    e, pairs = _semdedup_pairs(emb, threshold, n_cells, centroids)
    labels = dedup_clusters(pairs.select("doc_a", "doc_b"))
    spine = (
        e.select("vec_id")
        .join(labels.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", F.col("vec_id")).alias("cluster_id"),
        )
    )
    return keep_best_per_cluster(
        spine, scores, id_col="vec_id", cluster_col="cluster_id",
        score_col=score_col,
    )
