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

# The fixed NeTEx property key set carried in prop spans (FIXTURES.md
# span encoding; mirrors the reference's bean fields). ``props`` is a
# typed struct over these keys, not map<string,string>: consumers read
# known keys only, struct access is O(1) whole-stage codegen, null =
# absent.
ENTITY_PROP_KEYS = (
    "name", "nameLang", "description", "descriptionLang", "privateCode",
    "publicCode", "stopPlaceType", "airSubmode", "busSubmode",
    "coachSubmode", "funicularSubmode", "metroSubmode", "railSubmode",
    "tramSubmode", "telecabinSubmode", "waterSubmode",
    "snowAndIceSubmode", "weighting", "parentSiteRef", "adjacentSites",
    "keyList", "totalCapacity", "principalCapacity",
    "numberOfParkingLevels", "covered", "parkingVehicleTypes",
    "validFrom", "validTo", "parentDocId",
)

ENTITY_PROPS = T.StructType(
    [T.StructField(k, T.StringType(), True) for k in ENTITY_PROP_KEYS]
)

# Typed entity frame produced by extract.extract_entities().
ENTITIES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("version", T.StringType(), True),
        T.StructField("props", ENTITY_PROPS, True),
        T.StructField("geom_wkt", T.StringType(), True),
        T.StructField("valid_from", T.TimestampNTZType(), True),
        T.StructField("valid_to", T.TimestampNTZType(), True),
        T.StructField("spans", T.ArrayType(SPAN, containsNull=False), False),
    ]
)

# Canonical property field set — the union of every property any of
# the four reference mappers can set (SURVEY.md §2 P1-P15). null field
# = property absent (the reference never calls setProperty for absent
# values, MapperHelper.java:44-62).
PROP_FIELDS = (
    "name", "nameLang", "description", "descriptionLang", "privateCode",
    "id", "codeSpace", "entityType", "submode", "stopPlaceType",
    "finalStopPlaceType", "publicCode", "weighting", "hasParentSiteRef",
    "isParentStopPlace", "isPrimaryAdjacentSite", "totalCapacity",
    "principalCapacity", "numberOfParkingLevels", "covered",
    "parkingVehicleTypes",
)

PROPS = T.StructType(
    [T.StructField(k, T.StringType(), True) for k in PROP_FIELDS]
)

# Canonical feature row (asag GeoJSON Feature equivalent —
# ZoneToGeoJsonFeatureMapper.java:51-66 + per-type extras). A fixed
# wide StructType instead of a map so Catalyst can prune fields AND so
# the property build stays in whole-stage codegen — every null-dropping
# map constructor is (or contains) a CodegenFallback expression that
# forces interpreted eval of the whole ~25-value subtree per row
# (measured +75 s / 10M docs at 16 cores). The null-skipped string
# property map exists only in the GeoJSON text at the sink
# (geojson.feature_json, via concat_ws which drops null fragments).
FEATURES = T.StructType(
    [
        T.StructField("feature_id", T.StringType(), False),
        T.StructField("section", T.IntegerType(), False),  # 0 stops/quays, 1 parkings, 2 tariff zones (O3)
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("geometry_wkt", T.StringType(), True),
        T.StructField("lon", T.DoubleType(), True),  # point features only
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("properties", PROPS, False),
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
