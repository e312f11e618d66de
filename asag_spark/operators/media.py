"""Multimodal span plumbing (task brief).

Image/audio/video ride as opaque references/binary in ``media`` spans
(kind='media', media_ref like 'img://...'). The decode step is STUBBED
— no imaging libraries exist in this container — but the Spark-side
plumbing is real and tested: schema, Arrow batch shape, partitioning,
and deterministic fake features so downstream operators (similarity,
dedup) are exercisable end-to-end.

``decode_media`` gates on PIL availability: with a real image lib it
would decode bytes; here it raises NotImplementedError unless
``allow_stub=True``, in which case a clearly-marked deterministic fake
(md5-derived) stands in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def extract_media(docs: DataFrame) -> DataFrame:
    """Explode media spans: (doc_id, media_ref, span_idx) — the media
    catalog. posexplode keeps the original span order so the
    span-sequence invariant stays checkable."""
    return docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).filter(F.col("span.kind") == "media").select(
        "doc_id",
        F.col("span.media_ref").alias("media_ref"),
        "span_idx",
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("duration_s", T.IntegerType()),
        T.StructField("is_stub", T.BooleanType()),
    ]
)


def decode_media(media: DataFrame, allow_stub: bool = True) -> DataFrame:
    """Decode metadata per media ref (mapInPandas, Arrow-batched).

    STUB: real decoding needs an image library not present in this
    container. The fake is a pure function of media_ref (md5-derived
    dims), marked ``is_stub=True``.
    """
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil and not allow_stub:
        raise NotImplementedError(
            "media decode requires an imaging library (PIL) not present "
            "in this environment; pass allow_stub=True for the "
            "deterministic fake"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, fmts, durs = [], [], [], []
            for ref in pdf["media_ref"]:
                d = hashlib.md5(ref.encode()).digest()
                widths.append(64 + d[0] * 8)
                heights.append(64 + d[1] * 8)
                fmts.append(["jpeg", "png", "webp"][d[2] % 3])
                durs.append(1 + d[3] % 120)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "width": widths,
                    "height": heights,
                    "format": fmts,
                    "duration_s": durs,
                    "is_stub": [not have_pil] * len(pdf),
                }
            )

    return media.select("doc_id", "media_ref").mapInPandas(
        kernel, schema=_DECODE_SCHEMA
    )


def resize_dims(decoded: DataFrame, target: int = 256) -> DataFrame:
    """Aspect-preserving thumbnail plan: + (new_width, new_height) so
    the longer edge equals ``target`` (images already within target
    keep their dims). Pure JVM arithmetic over the decoded metadata —
    the actual pixel resample would ride the same Arrow kernel as
    decode; the plan (the part Spark owns: dims, schema, partitioning)
    is real and exact."""
    w, h = F.col("width"), F.col("height")
    t = float(target)
    fits = (w <= target) & (h <= target)
    nw = F.when(fits, w).otherwise(
        F.when(w >= h, F.lit(target))
        .otherwise(F.greatest(F.floor(w * t / h).cast("int"), F.lit(1)))
    )
    nh = F.when(fits, h).otherwise(
        F.when(w >= h, F.greatest(F.floor(h * t / w).cast("int"), F.lit(1)))
        .otherwise(F.lit(target))
    )
    return decoded.withColumn("new_width", nw).withColumn("new_height", nh)


def sample_frames(decoded: DataFrame, every_s: int = 10) -> DataFrame:
    """Frame-sampling plan: one row per sampled timestamp, every
    ``every_s`` seconds through the (stub) duration — `sequence` +
    `explode`, all JVM; the frame decode itself would be the Arrow
    kernel consuming (media_ref, frame_ts_s) batches. Output size is
    data-dependent (duration/every_s rows per medium) — the explode is
    the scale knob, not a per-row Python loop."""
    return decoded.select(
        "doc_id", "media_ref", "duration_s",
        F.posexplode(
            F.sequence(
                F.lit(0), F.col("duration_s") - 1, F.lit(int(every_s))
            )
        ).alias("frame_idx", "frame_ts_s"),
    )


def media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic pseudo-embedding per media ref (STUB feature
    extractor): md5 bytes → L2-normalized float vector. The Arrow
    batch shape and schema match what a real CLIP-style extractor
    would produce — downstream ANN/dedup plumbing is real."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for ref in pdf["media_ref"]:
                d = hashlib.md5(ref.encode()).digest()
                v = np.frombuffer(d[:dim], dtype=np.uint8).astype(np.float32)
                v = (v - 127.5) / 127.5
                n = float(np.linalg.norm(v)) or 1.0
                feats.append((v / n).tolist())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"],
                 "feature": feats}
            )

    return media.select("doc_id", "media_ref").mapInPandas(kernel, schema=out_schema)
