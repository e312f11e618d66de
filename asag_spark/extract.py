"""Span → typed-entity extraction (SURVEY.md §1.3, S4).

The reference does a selective StAX scan that materializes only
StopPlace/Parking/TariffZone elements
(/root/reference/src/main/java/org/entur/asag/mapbox/
DeliveryPublicationStreamToGeoJson.java:95-125). Here the docs table is
columnar, so "selective scan" = column pruning + span-kind filtering —
all with built-in higher-order functions (JVM-side, whole-stage
codegen). No Python runs per row.

Per-row invariant (input_hint): the original ``spans`` array rides
through unchanged so span-sequence equality can be asserted on any
downstream output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _first_span_text(kind: str) -> Column:
    return F.try_element_at(
        F.filter("spans", lambda s: s["kind"] == F.lit(kind)), F.lit(1)
    )["text"]


def _kv_entries(texts: Column) -> Column:
    """array<'k=v' string> → array<struct<key,value>> splitting on the
    FIRST '=' only (values may contain '=')."""
    return F.transform(
        texts,
        lambda t: F.struct(
            F.substring_index(t, "=", 1).alias("key"),
            F.substr(
                t, F.length(F.substring_index(t, "=", 1)) + F.lit(2)
            ).alias("value"),
        ),
    )


def extract_entities(docs: DataFrame) -> DataFrame:
    """docs(doc_id, spans) → typed entity frame (schema.ENTITIES).

    meta span: ``entity_type=X;id=Y;version=Z`` → discriminator columns
    (the reference's polymorphic instanceof dispatch, F3 —
    PublicationDeliveryHelper.java:60-61 — collapses to a column).
    prop spans: ``key=value`` → ``props`` map. geom span: WKT passthrough.
    """
    meta = F.str_to_map(_first_span_text("meta"), F.lit(";"), F.lit("="))
    prop_texts = F.transform(
        F.filter("spans", lambda s: s["kind"] == F.lit("prop")),
        lambda s: s["text"],
    )
    out = docs.select(
        "doc_id",
        meta.alias("_meta"),
        F.map_from_entries(_kv_entries(prop_texts)).alias("props"),
        _first_span_text("geom").alias("geom_wkt"),
        "spans",
    ).select(
        "doc_id",
        F.col("_meta")["entity_type"].alias("entity_type"),
        F.col("_meta")["id"].alias("id"),
        F.col("_meta")["version"].alias("version"),
        "props",
        "geom_wkt",
        F.to_timestamp_ntz(F.col("props")["validFrom"]).alias("valid_from"),
        F.to_timestamp_ntz(F.col("props")["validTo"]).alias("valid_to"),
        "spans",
    )
    return out


def keylist_value(props: Column, key: str) -> Column:
    """First value for ``key`` in the keyList prop ('k:v|k2:v2'; values
    may contain ':'). Mirrors KeyValuesHelper.getValueByKey
    (/root/reference/.../mapper/KeyValuesHelper.java:28-39): first
    match wins, absent → null (property not set).
    """
    entries = F.filter(
        F.split(props["keyList"], r"\|"),
        lambda kv: F.substring_index(kv, ":", 1) == F.lit(key),
    )
    first = F.try_element_at(entries, F.lit(1))
    return F.when(
        first.isNotNull(),
        F.substr(first, F.length(F.substring_index(first, ":", 1)) + F.lit(2)),
    )
