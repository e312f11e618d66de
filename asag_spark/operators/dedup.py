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
* SimHash — 32-bit, md5-derived token hashes, pure built-in
  expressions (32 vote sums in one hash aggregate).
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
    """Distinct word n-gram shingles per doc: (doc_id, shingle).

    HOF-free n-gram build (transform/sequence lambdas are
    CodegenFallback and eject the projection from whole-stage codegen):
    arrays_zip of n shifted slices of the token array gives the n-gram
    structs; arrays_zip null-pads short docs (size < n) so the single
    partial shingle survives, and concat_ws skips the padding nulls —
    byte-identical to array_join over the short slice. Tokens are
    whitespace-split (never contain the ' ' delimiter), so distinct
    structs ⟺ distinct joined shingle strings and array_distinct can
    run before the explode/concat."""
    toks = tokens(F.lower(F.col(text_col)))
    m = F.greatest(F.size(toks) - n + 1, F.lit(1))
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, m).alias(f"t{i}") for i in range(n)]
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(zipped)).alias("x")
    ).select(
        "doc_id",
        F.concat_ws(" ", *[F.col(f"x.t{i}") for i in range(n)]).alias("shingle"),
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


# One md5 per shingle, then cheap affine rehash per minhash function:
# h_i = (a_i * h + b_i) mod MINHASH_P over h = first 60 bits of
# md5(shingle). 16x fewer md5 evaluations than md5('{i}:'||shingle)
# per shingle, identical SQL on DuckDB (('0x'||hex)::BIGINT), and the
# affine family is the textbook universal-hash construction.
MINHASH_P = 2147483647  # 2^31-1; products stay < 2^62 (no overflow)
MINHASH_PARAMS = [
    ((i * 2654435761 + 1) % MINHASH_P, (i * 40503 + 17) % MINHASH_P)
    for i in range(64)
]


def _shingle_hash60(shingle):
    """First 15 hex chars of md5 → bigint (same on DuckDB)."""
    return F.conv(F.substring(F.md5(shingle), 1, 15), 16, 10).cast("long")


def minhash_signatures(docs: DataFrame, num_hashes: int = 16,
                       text_col: str = "text") -> DataFrame:
    """MinHash signature columns h0..h{n-1}: per-doc min of affine
    rehashes of the shingle's 60-bit md5 prefix (engine-portable)."""
    sh = shingles(docs, text_col)
    h = (_shingle_hash60(F.col("shingle")) % MINHASH_P).alias("h")
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS[:num_hashes])
    ]
    return sh.select("doc_id", h).groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(docs: DataFrame, num_hashes: int = 16, bands: int = 4,
                        text_col: str = "text") -> DataFrame:
    """MinHash-LSH candidates: docs sharing any band bucket.
    Output (doc_a, doc_b) distinct, doc_a < doc_b. Banding is a single
    posexplode over the signature row (one scan, one shuffle)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, text_col)
    band_keys = F.array(*[
        F.concat_ws("|", *[
            F.col(f"h{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ])
        for b in range(bands)
    ])
    buckets = sig.select(
        "doc_id", F.posexplode(band_keys).alias("band", "bkey")
    )
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


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit SimHash over md5-derived token hashes — pure built-in
    expressions (whole-stage codegen, no Python workers), and the md5
    base makes the whole operator DuckDB-expressible so the near-dup
    query carries a full value oracle. Per token occurrence (multiset,
    matching classic SimHash): bit j votes +1 if bit j of the hash is
    set else -1; signature bit j = (votes_j > 0)."""
    toks = tokens(F.lower(F.col(text_col)))
    h32 = F.pmod(
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long"),
        F.lit(1 << 32),
    )
    exploded = docs.select(
        "doc_id", F.explode_outer(toks).alias("tok")
    ).select("doc_id", "tok", h32.alias("h32"))
    aggs = [
        F.sum(
            F.when(F.col("tok").isNull(), 0)
            .when(F.shiftright(F.col("h32"), j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{j}")
        for j in range(32)
    ]
    sig = exploded.groupBy("doc_id").agg(*aggs)
    bits = [
        F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(32)
    ]
    acc = bits[0]
    for b in bits[1:]:
        acc = acc + b
    return sig.select("doc_id", acc.cast("long").alias("simhash"))


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
