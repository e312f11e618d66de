"""Deduplication operators (task brief): exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale design:
* exact — one hash-groupBy on the md5 fingerprint (map-side partial
  agg; the only shuffle).
* n-gram Jaccard — shingle explode + equi-join on shingle. At 100 TB
  the shingle join is the classic quadratic blowup, so it is the
  VERIFY stage of MinHash-LSH, not a standalone full-corpus pass.
* MinHash+LSH — signatures via groupBy(doc).agg(min(md5(i||shingle)))
  (numHashes aggregates, one shuffle), banding via one more
  groupBy(band_key). Candidates per band bucket; Jaccard verify only
  on candidates. All md5-based so a SQL oracle matches exactly.
* SimHash — 32-bit crc-based, Arrow-batched numpy kernel.
* embedding cosine — sign-LSH bucketing (first SIGN_DIMS dims) to
  keep the self-join within buckets; exact cosine refine.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import fingerprint, tokens

SHINGLE_N = 3


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per distinct normalized text: keeper = min doc_id,
    n_dups = group size."""
    fp = fingerprint(docs, text_col)
    return fp.groupBy("fp").agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def shingles(docs: DataFrame, text_col: str = "text", n: int = SHINGLE_N) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle)."""
    toks = tokens(F.lower(F.col(text_col)))
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("shingle")
    )


def jaccard_pairs(docs: DataFrame, threshold: float = 0.8,
                  text_col: str = "text") -> DataFrame:
    """Doc pairs with shingle-Jaccard ≥ threshold (exact; the verify
    primitive). Output (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    sh = shingles(docs, text_col).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 16,
                       text_col: str = "text") -> DataFrame:
    """MinHash signature columns h0..h{n-1}: per-doc min of
    md5('{i}:'||shingle) — engine-portable (md5 everywhere)."""
    sh = shingles(docs, text_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(docs: DataFrame, num_hashes: int = 16, bands: int = 4,
                        text_col: str = "text") -> DataFrame:
    """MinHash-LSH candidates: docs sharing any band bucket.
    Output (doc_a, doc_b) distinct, doc_a < doc_b."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, text_col)
    band_frames = []
    for b in range(bands):
        cols = [f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
        band_frames.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.concat_ws("|", *[F.col(c) for c in cols]).alias("bkey"),
            )
        )
    buckets = band_frames[0]
    for bf in band_frames[1:]:
        buckets = buckets.unionByName(bf)
    x = buckets.alias("x")
    y = buckets.alias("y")
    return (
        x.join(y, (F.col("x.band") == F.col("y.band")) & (F.col("x.bkey") == F.col("y.bkey")))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_dedup(docs: DataFrame, threshold: float = 0.8,
                  num_hashes: int = 16, bands: int = 4,
                  text_col: str = "text") -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify.
    At scale the verify join touches only candidate docs."""
    cands = lsh_candidate_pairs(docs, num_hashes, bands, text_col)
    verified = jaccard_pairs(
        docs.join(
            cands.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id")).distinct(),
            "doc_id",
            "left_semi",
        ),
        threshold,
        text_col,
    )
    return verified.join(cands, ["doc_a", "doc_b"], "left_semi")


_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit SimHash over crc32 token hashes (Arrow-batched numpy;
    crc32 is deterministic across runs, unlike Python's str hash)."""
    import zlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            for row_i, text in enumerate(pdf[text_col]):
                toks = (text or "").lower().split()
                if not toks:
                    continue
                hashes = np.array(
                    [zlib.crc32(t.encode()) for t in toks], dtype=np.uint32
                )
                bits = (hashes[:, None] >> np.arange(32)[None, :]) & 1
                votes = (2 * bits - 1).sum(axis=0)
                out[row_i] = int((votes > 0).astype(np.uint32) @ (1 << np.arange(32, dtype=np.uint64)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return docs.select("doc_id", text_col).mapInPandas(kernel, schema=_SIMHASH_SCHEMA)


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3,
                      text_col: str = "text") -> DataFrame:
    """SimHash near-dup pairs: same 16-bit prefix band (2 bands) then
    Hamming ≤ max_hamming — the standard bit-band LSH for SimHash."""
    sh = simhash(docs, text_col)
    banded = sh.select(
        "doc_id", "simhash",
        F.explode(
            F.array(
                F.concat_ws(":", F.lit("hi"), F.shiftright("simhash", 16)),
                F.concat_ws(":", F.lit("lo"), F.col("simhash").bitwiseAND(F.lit(0xFFFF))),
            )
        ).alias("bkey"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, "bkey")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


SIGN_DIMS = 4


def embedding_near_dups(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ threshold.

    Bucketing: sign bits of the first SIGN_DIMS dimensions (a
    deterministic hyperplane LSH — vectors this similar almost surely
    share all sign bits). Exact cosine refine inside buckets; doubles
    throughout, rounded to 6 for engine parity.
    """
    sign_key = F.concat_ws(
        "",
        *[
            (F.element_at("embedding", i + 1) >= 0).cast("int").cast("string")
            for i in range(SIGN_DIMS)
        ],
    )
    e = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        F.sqrt(
            F.aggregate(
                F.col("embedding").cast("array<double>"),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
        ).alias("norm"),
        sign_key.alias("bucket"),
    )
    a = e.alias("a")
    b = e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
