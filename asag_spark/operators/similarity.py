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

from .dedup import EMB_LSH_BANDS, EMB_LSH_BITS, band_keys


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
    dot = F.aggregate(
        F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return F.round(dot / (an * bn), 6)


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
        import pandas as pd

        q_ids_v, Qt, qn_v = bq.value
        nq = len(q_ids_v)
        # per-query candidate pools accumulated across the partition
        ids_pool: list = []
        cos_pool: list = []
        for batch in batches:
            ids = batch["vec_id"].to_numpy()
            B = np.stack(batch["embedding"].to_numpy())
            bn = np.sqrt((B * B).sum(axis=1))
            S = np.round((B @ Qt) / (bn[:, None] * qn_v[None, :]), 6)
            S[ids[:, None] == q_ids_v[None, :]] = -np.inf  # self-matches
            if len(ids) > k:
                # np.argpartition per query column: batch-local top-k by
                # cosine only — ties at the boundary are resolved in the
                # pool reduction below, so keep k+ties safe by taking
                # everything >= the k-th value
                kth = np.partition(S, -k, axis=0)[-k, :]
                keep = S >= kth[None, :]
            else:
                keep = S > -np.inf
            rows, cols = np.nonzero(keep)
            ids_pool.append((ids[rows], cols, S[rows, cols]))
        if not ids_pool:
            return
        nid = np.concatenate([p[0] for p in ids_pool])
        qcol = np.concatenate([p[1] for p in ids_pool])
        cos = np.concatenate([p[2] for p in ids_pool])
        # partition-local exact top-k per query: (cosine desc,
        # neighbor_id asc) via lexsort (last key is primary)
        out_q, out_n, out_c = [], [], []
        for j in range(nq):
            m = qcol == j
            if not m.any():
                continue
            nj, cj = nid[m], cos[m]
            order = np.lexsort((nj, -cj))[:k]
            out_q.append(np.repeat(q_ids_v[j], len(order)))
            out_n.append(nj[order])
            out_c.append(cj[order])
        if out_q:
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    cand = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).mapInPandas(part_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine")
    )


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
    tie-break order assignment relies on)."""
    import numpy as np

    rows = (
        emb.select("vec_id", F.col("embedding").cast("array<double>"))
        .withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h", "vec_id")
        .limit(n_cells)
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r[0])  # columns by c_id asc → argmax ties → smallest id
    c_ids = np.array([r[0] for r in rows])
    C = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    return c_ids, C


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             n_cells: int = IVF_CELLS, nprobe: int = IVF_NPROBE) -> DataFrame:
    """IVF-flat approximate top-k (the brief's named ANN scale path,
    alongside the LSH-banded variant): assign every corpus vector to
    its nearest centroid (one Arrow matmul per batch — map-only), then
    each query scans ONLY its ``nprobe`` nearest cells, i.e. a
    ~nprobe/n_cells fraction of the corpus, with the same
    per-partition matmul + local top-k + tiny global merge as the
    brute path. The corpus never shuffles; candidates (≤ partitions ×
    n_q × k rows) are the only exchange. Ranking ties and centroid
    ties both break on id over 6-decimal-rounded cosines, so the
    assignment and result are parallelism- and engine-invariant.

    At 10^12 vectors the assignment pass writes (vec_id, cell_id) once
    (cells ~ sqrt(N)), the probed fraction bounds each query's work,
    and cell-partitioned storage turns the probe into partition
    pruning — the standard IVF-flat layout."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    id_type = emb.schema["vec_id"].dataType
    c_ids, C = ivf_centroids(emb, n_cells)
    cn = np.sqrt((C * C).sum(axis=1))

    q_rows = queries.select(
        "vec_id", F.col("embedding").cast("array<double>")
    ).collect()
    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    if not q_rows:
        return emb.sparkSession.createDataFrame(
            [], out_schema.add("rank", T.IntegerType())
        ).select("query_id", "neighbor_id", "rank", "cosine")
    q_ids = np.array([r[0] for r in q_rows])
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qn = np.sqrt((Q * Q).sum(axis=1))

    # driver-side probe sets: per query the nprobe cells nearest by
    # rounded cosine, ties to smaller centroid id (argsort is stable
    # and columns are c_id-ascending)
    SQ = np.round((Q @ C.T) / (qn[:, None] * cn[None, :]), 6)
    probe_cols = np.argsort(-SQ, axis=1, kind="stable")[:, :nprobe]
    # membership matrix over centroid columns: M[c, j] = query j probes cell c
    M = np.zeros((len(c_ids), len(q_ids)), dtype=bool)
    for j in range(len(q_ids)):
        M[probe_cols[j], j] = True

    bc = emb.sparkSession.sparkContext.broadcast(
        (c_ids, C.T.copy(), cn, q_ids, Q.T.copy(), qn, M)
    )

    def probe_topk(batches):
        c_ids_v, Ct, cn_v, q_ids_v, Qt, qn_v, M_v = bc.value
        nq = len(q_ids_v)
        pool: list = []
        for batch in batches:
            ids = batch["vec_id"].to_numpy()
            B = np.stack(batch["embedding"].to_numpy())
            bn = np.sqrt((B * B).sum(axis=1))
            # cell assignment: rounded cosine argmax; np.argmax returns
            # the FIRST maximal column and columns are c_id-ascending,
            # so ties resolve to the smallest centroid id — the same
            # order the oracle's (cos DESC, c_id ASC) row_number uses
            SC = np.round((B @ Ct) / (bn[:, None] * cn_v[None, :]), 6)
            cell_col = np.argmax(SC, axis=1)
            S = np.round((B @ Qt) / (bn[:, None] * qn_v[None, :]), 6)
            S[~M_v[cell_col, :]] = -np.inf       # not in a probed cell
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
        nid = np.concatenate([p[0] for p in pool])
        qcol = np.concatenate([p[1] for p in pool])
        cos = np.concatenate([p[2] for p in pool])
        out_q, out_n, out_c = [], [], []
        for j in range(nq):
            m = qcol == j
            if not m.any():
                continue
            nj, cj = nid[m], cos[m]
            order = np.lexsort((nj, -cj))[:k]
            out_q.append(np.repeat(q_ids_v[j], len(order)))
            out_n.append(nj[order])
            out_c.append(cj[order])
        if out_q:
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    cand = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).mapInPandas(probe_topk, out_schema)
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
