"""Canonical StructTypes for the engine.

Shapes follow SURVEY.md §1.2 / FIXTURES.md. The docs schema is exactly
the driver's ``input_hint``:

    docs(doc_id: string,
         spans:  array<struct<kind:string, text:string,
                              media_ref:string, offset:int>>)

Entity columns mirror the reference's NeTEx bean fields
(/root/reference/src/main/java/org/entur/asag/mapbox/mapper/*.java).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN, containsNull=False), False),
    ]
)

# NeTEx submode precedence order — explicit column list replacing the
# reference's reflection scan over get*Submode getters
# (PublicationDeliveryHelper.java:106-126). Order matches Java bean
# getter declaration order used by the reference's stream().findFirst().
SUBMODE_KEYS = [
    "airSubmode",
    "busSubmode",
    "coachSubmode",
    "funicularSubmode",
    "metroSubmode",
    "railSubmode",
    "tramSubmode",
    "telecabinSubmode",
    "waterSubmode",
    "snowAndIceSubmode",
]

# Typed entity frame produced by extract.extract_entities().
ENTITIES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("version", T.StringType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("geom_wkt", T.StringType(), True),
        T.StructField("valid_from", T.TimestampNTZType(), True),
        T.StructField("valid_to", T.TimestampNTZType(), True),
        T.StructField("spans", T.ArrayType(SPAN, containsNull=False), False),
    ]
)

# Canonical feature row (asag GeoJSON Feature equivalent —
# ZoneToGeoJsonFeatureMapper.java:51-66 + per-type extras). A fixed
# wide StructType instead of a map so Catalyst can prune columns; the
# string property map is materialized only at the GeoJSON sink.
FEATURES = T.StructType(
    [
        T.StructField("feature_id", T.StringType(), False),
        T.StructField("section", T.IntegerType(), False),  # 0 stops/quays, 1 parkings, 2 tariff zones (O3)
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("geometry_wkt", T.StringType(), True),
        T.StructField("lon", T.DoubleType(), True),  # point features only
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("adjacent_sites", T.ArrayType(T.StringType()), True),
    ]
)

ZONES = T.StructType(
    [
        T.StructField("zone_id", T.StringType(), False),
        T.StructField("zone_kind", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("geom_wkt", T.StringType(), False),
    ]
)

TILES = T.StructType(
    [
        T.StructField("feature_id", T.StringType(), False),
        T.StructField("h3_r7", T.StringType(), True),
        T.StructField("h3_r8", T.StringType(), True),
        T.StructField("h3_r9", T.StringType(), True),
        T.StructField("h3_r10", T.StringType(), True),
        T.StructField("s2_cell", T.StringType(), True),
        T.StructField("s2_cover", T.ArrayType(T.StringType()), True),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("input_fingerprint", T.StringType(), True),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)
