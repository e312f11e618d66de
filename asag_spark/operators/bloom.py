"""Bloom-filter semi-join prefilter — cut the shuffled volume of a
big⋈small equi-join by broadcasting a compact bit-array summary of the
small side and dropping big-side rows that cannot match BEFORE they
reach the exchange.

This is the classic bloom-join (and what Spark's own
InjectRuntimeFilter does for plans it recognizes — hand-rolled here so
it composes with any operator and so the summary can be REUSED across
jobs). At 10 bits/key the filter is 20–50× smaller than broadcasting
the key set itself (1 GB of md5 fingerprints summarize to ~25 MB), and
membership is two shifts and an AND instead of a hash-map probe.
Guarantee: NO false negatives — the downstream exact join removes the
~1% false positives, so any (prefilter + join) composition is exactly
equal to the plain join.

Plan shape at 100 TB: the build side is one explode(k positions) +
map-combined bit_or groupBy over the SMALL side (m/64 result rows, a
few MB); the probe is a scan-fused vectorized filter on the BIG side —
positions computed JVM-side (xxhash64 + pmod, whole-stage codegen),
the bit test an Arrow-batched pandas_udf over a numpy int64 array
(~3 vector ops per hash, no per-row Python). Rows that fail never
shuffle: for a 0.1%-selective probe the join exchange shrinks ~1000×.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 20
DEFAULT_N_HASHES = 7


def _check_params(m_bits: int, n_hashes: int) -> None:
    if m_bits < 64 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")


def _position(col: Column, i: int, m_bits: int) -> Column:
    """Bit position of hash i: pmod(xxhash64(value, i), m). Seeding by
    hashing the index alongside the value gives n_hashes independent
    64-bit hashes from the one JVM-side xxhash64 kernel."""
    return F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))


def bloom_build(
    small: DataFrame,
    col: str,
    m_bits: int = DEFAULT_M_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Distributed Bloom build over the small side: explode the
    n_hashes bit positions per key, OR them into 64-bit words with a
    map-combined bit_or aggregate. Returns (word_idx:int, word:long) —
    only words with at least one set bit, at most m_bits/64 rows."""
    _check_params(m_bits, n_hashes)
    pos = F.explode(
        F.array(*[_position(F.col(col), i, m_bits) for i in range(n_hashes)])
    ).alias("_pos")
    return (
        small.select(pos)
        .select(
            F.shiftright("_pos", 6).cast("int").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 64) AS INT))"
            ).alias("_mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def bloom_to_array(words: DataFrame, m_bits: int) -> np.ndarray:
    """Collect the sparse word table into the dense int64 bit array
    the probe side broadcasts (m_bits/8 bytes — driver-safe by
    construction: m is a chosen constant, not data-dependent)."""
    arr = np.zeros(m_bits >> 6, dtype=np.int64)
    for r in words.collect():
        arr[r["word_idx"]] = r["word"]
    return arr


def bloom_prefilter(
    big: DataFrame,
    col: str,
    bloom: np.ndarray,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Keep only big-side rows whose ``col`` MIGHT be in the set the
    bit array summarizes (superset semantics: never drops a true
    match). Positions are JVM-computed columns; the bit test is one
    Arrow batch kernel over the broadcast numpy array."""
    m_bits = int(bloom.shape[0]) << 6
    _check_params(m_bits, n_hashes)
    sc = big.sparkSession.sparkContext
    bc = sc.broadcast(bloom)

    @F.pandas_udf("boolean")
    def _might_contain(*pos_cols: pd.Series) -> pd.Series:
        words = bc.value
        ok = np.ones(len(pos_cols[0]), dtype=bool)
        for p in pos_cols:
            pv = p.to_numpy(dtype=np.int64)
            ok &= ((words[pv >> 6] >> (pv & 63)) & 1).astype(bool)
        return pd.Series(ok)

    positions = [_position(F.col(col), i, m_bits) for i in range(n_hashes)]
    return big.filter(_might_contain(*positions))


def bloom_semi_join_prefilter(
    big: DataFrame,
    small: DataFrame,
    col: str,
    m_bits: int = DEFAULT_M_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """End-to-end: summarize small[col], prefilter big[col]. The
    result is a SUPERSET of big semi-join small (false-positive rate
    ~(1 - e^(-kn/m))^k, ~1% at 10 bits/key, k=7); compose with the
    exact join for exact results."""
    words = bloom_build(small, col, m_bits, n_hashes)
    return bloom_prefilter(big, col, bloom_to_array(words, m_bits), n_hashes)
