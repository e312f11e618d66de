"""Similarity search over the embeddings table (task brief): exact
brute-force cosine top-k baseline + LSH-bucketed approximate variant.

Scale design: the exact path broadcasts the (small) query set against
the full corpus — a map-only pass, no shuffle except the final
per-query top-k. The approximate path prunes the corpus to matching
sign-LSH buckets first (same deterministic hyperplanes as
dedup.embedding_near_dups), turning the scan into a bucket-local
probe — the IVF-style cell restriction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import SIGN_DIMS


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

    ``queries``: frame with (vec_id, embedding) — usually a small
    selection of the corpus; it is broadcast. Self-matches excluded.
    Output (query_id, neighbor_id, rank, cosine); ties break on
    neighbor_id for determinism.
    """
    q = _with_norm(queries, "q")
    c = _with_norm(emb, "n")
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
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


def sign_bucket(col=None):
    """Deterministic sign-LSH bucket key over the first SIGN_DIMS dims."""
    e = col if col is not None else F.col("embedding")
    return F.concat_ws(
        "",
        *[
            (F.element_at(e, i + 1) >= 0).cast("int").cast("string")
            for i in range(SIGN_DIMS)
        ],
    )


def cosine_topk_lsh(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket (IVF-style cell probe; recall < 1 by design, the scale path
    for 10^12 vectors where brute force is off the table)."""
    q = _with_norm(queries, "q").join(
        queries.select(F.col("vec_id").alias("q_id"), sign_bucket().alias("bucket")),
        "q_id",
    )
    c = _with_norm(emb, "n").join(
        emb.select(F.col("vec_id").alias("n_id"), sign_bucket().alias("bucket")),
        "n_id",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
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
