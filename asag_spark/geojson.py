"""Feature → canonical GeoJSON (asag-compatible sink S6).

The reference frames a FeatureCollection by hand and Jackson-serializes
each feature (DeliveryPublicationStreamToGeoJson.java:254-287). Here the
per-feature JSON is built with built-in ``to_json`` over a struct —
JVM-side — and collection framing happens per tile group (tiles.py) or
at single-file assembly.

Canonical order is (section, feature_id) — the reference's HashSet
iteration order is nondeterministic and its tests assert membership
only (SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_str(c: Column) -> Column:
    """JSON-escaped string literal of a string column (built-in only:
    to_json needs a container type, so escape via a 1-element array
    and strip the brackets)."""
    arr = F.to_json(F.array(c))
    return F.substr(arr, F.lit(2), F.length(arr) - F.lit(2))


def geometry_json(geometry_wkt: Column, lon: Column, lat: Column) -> Column:
    """GeoJSON geometry object as a JSON string.

    Points use the carried lon/lat doubles (exact passthrough like the
    reference's .doubleValue() — ZoneToGeoJsonFeatureMapper.java:78-79).
    Polygons re-shape the WKT exterior ring into [[lon,lat],...] with
    string manipulation — all built-in functions.
    """
    point = F.concat(
        F.lit('{"type":"Point","coordinates":['),
        lon.cast("string"), F.lit(","), lat.cast("string"), F.lit("]}"),
    )
    ring_body = F.regexp_replace(
        F.regexp_extract(geometry_wkt, r"POLYGON\(\((.*)\)\)", 1),
        r"([-\d.eE+]+) ([-\d.eE+]+)", r"[$1,$2]",
    )
    polygon = F.concat(
        F.lit('{"type":"Polygon","coordinates":[['),
        F.regexp_replace(ring_body, r",\s*\[", ",["),
        F.lit("]]}"),
    )
    return F.when(geometry_wkt.startswith("POINT"), point).when(
        geometry_wkt.startswith("POLYGON"), polygon
    )


def feature_json(df: DataFrame) -> DataFrame:
    """+ ``feature_json`` column: one GeoJSON Feature per row.

    Properties are emitted key-sorted for determinism; null struct
    fields (absent properties) drop out natively because ``concat_ws``
    skips null fragments — the whole JSON build is whole-stage codegen
    (no HOFs). adjacentSites rides as a JSON array property like the
    reference's Set<String> property
    (StopPlaceToGeoJsonFeatureMapper.java:80).
    """
    from .schema import PROP_FIELDS

    frags = [
        F.when(
            F.col("properties")[k].isNotNull(),
            F.concat(
                F.lit(f'"{k}":'), json_str(F.col("properties")[k])
            ),
        )
        for k in sorted(PROP_FIELDS)
    ]
    props_body = F.concat_ws(",", *frags)
    props_json = F.concat(
        F.lit("{"),
        props_body,
        F.when(
            F.col("adjacent_sites").isNotNull(),
            F.concat(
                F.when(F.length(props_body) > 0, F.lit(",")).otherwise(F.lit("")),
                F.lit('"adjacentSites":'),
                F.to_json("adjacent_sites"),
            ),
        ).otherwise(F.lit("")),
        F.lit("}"),
    )
    fj = F.concat(
        F.lit('{"type":"Feature","id":'),
        json_str(F.col("feature_id")),
        F.lit(',"geometry":'),
        F.coalesce(
            geometry_json(F.col("geometry_wkt"), F.col("lon"), F.col("lat")),
            F.lit("null"),
        ),
        F.lit(',"properties":'),
        props_json,
        F.lit("}"),
    )
    return df.withColumn("feature_json", fj)


def feature_collection(features_json: list[str]) -> str:
    """Driver-side framing for an in-memory list — fixture-scale only
    (mirrors the reference's header/comma/footer framing :274-287).
    For real outputs use ``write_feature_collection``."""
    return '{"features": [' + ",".join(features_json) + '], "type": "FeatureCollection"}'


def write_feature_collection(df: DataFrame, path: str,
                             order_by: tuple[str, ...] = ("section", "feature_id"),
                             buffer_bytes: int = 1 << 20) -> int:
    """Single-file FeatureCollection sink at scale: stream the
    ``feature_json`` column through ``toLocalIterator()`` with the
    reference's header/comma/footer framing
    (DeliveryPublicationStreamToGeoJson.java:274-287) — the driver
    holds ONE partition at a time, never the whole collection (the
    round-1 list assembly materialized every feature on the driver).
    Rows arrive in canonical (section, feature_id) order, matching the
    tiled sink's determinism contract; partitions are fetched lazily in
    that sort order. Returns the feature count.

    This is the asag-compat whole-output path; the scale-preferred
    layout remains per-tile files (geo/tiles.py) where no single-file
    bottleneck exists at all — a single .geojson file is inherently a
    one-writer sink, so the driver streams it; everything upstream
    (feature build, JSON render, sort) stays distributed."""
    fj = feature_json(df) if "feature_json" not in df.columns else df
    it = fj.orderBy(*order_by).select("feature_json").toLocalIterator(
        prefetchPartitions=True
    )
    n = 0
    buf: list[str] = []
    buf_len = 0
    with open(path, "w", encoding="utf-8") as out:
        out.write('{"features": [')
        for row in it:
            if n:
                buf.append(",")
            buf.append(row[0])
            buf_len += len(row[0]) + 1
            n += 1
            if buf_len >= buffer_bytes:
                out.write("".join(buf))
                buf, buf_len = [], 0
        out.write("".join(buf))
        out.write('], "type": "FeatureCollection"}')
    return n
