"""Distinct-count sketching (brief: "a novel sketch" as a custom
operator). KMV (k-minimum-values) instead of HyperLogLog ON PURPOSE:
KMV over md5 hashes is exactly reproducible in any engine (the value
oracle recomputes it bit-for-bit in DuckDB), while HLL register
layouts differ per implementation — `approx_count_distinct` here and
in DuckDB would never hash-match. Estimator: with h = the k-th
smallest distinct hash mapped into (0,1], E[distinct] ≈ (k-1)/h
(Bar-Yossef et al.'s KMV; unbiased for the uniform order statistic).

Scale shape: the (group, hash) dedupe is one map-combined exact
aggregate over narrow rows, then the per-group k-smallest rank window
runs on DISTINCT hashes only. A production 10^12-row version keeps
only k hashes per partition before the exchange (a custom Aggregator
buffer); here distinct-hash volume ≈ distinct values, which is the
same thing the exact count would shuffle — the sketch's win at scale
is the MERGEABILITY (k numbers per group cross the wire, and sketches
of partitions union into the sketch of the whole)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^60 — hashes are 15 hex chars = 60 bits, mapped into (0, 1]
_KMV_SCALE = float(1 << 60)


def _long_hash(col) -> F.Column:
    """md5 60-bit prefix + 1 → integer in [1, 2^60] — the dedupe and
    ranking key. INTEGER on purpose (round 3, ADVICE r02): casting to
    double before the (group, hash) distinct squeezed 60 bits through
    a 53-bit mantissa, silently colliding hashes that differ only in
    the low ~7 bits and undercounting below capacity. The unit-interval
    conversion now happens only in the final estimator expression.
    Hash idiom shared via text.md5_long60."""
    from .text import md5_long60

    return md5_long60(col.cast("string")) + F.lit(1)


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 64) -> DataFrame:
    """(group, est_distinct, n_hashes): KMV distinct-count estimate of
    ``value_col`` per group. Groups holding fewer than k distinct
    values report their EXACT distinct count (the sketch is lossless
    below its capacity — exact on the full 60-bit hash, not a rounded
    double of it). Deterministic: md5 is seedless, ties are impossible
    after the (group, hash) dedupe, and the long→double conversion is
    a single exact-input division both engines perform identically."""
    hashed = (
        df.select(F.col(group_col).alias("grp"),
                  _long_hash(F.col(value_col)).alias("hl"))
        .groupBy("grp", "hl")
        .agg(F.lit(1))  # map-combined distinct on narrow rows
        .select("grp", "hl")
    )
    w = Window.partitionBy("grp").orderBy(F.col("hl").asc())
    ranked = hashed.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    return (
        ranked.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_hashes"),
            F.max(F.when(F.col("r") == k, F.col("hl"))).alias("hk"),
        )
        .select(
            F.col("grp").alias(group_col),
            F.round(
                F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double"))
                .otherwise(
                    F.lit(float(k - 1))
                    / (F.col("hk").cast("double") / F.lit(_KMV_SCALE))
                ),
                4,
            ).alias("est_distinct"),
            F.col("n_hashes").cast("int").alias("n_hashes"),
        )
    )
