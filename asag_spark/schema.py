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

# NeTEx XSD enumeration domains (public NeTEx schema,
# netex_framework/part1 *.xsd simple types) for the typed-value
# validation in netex.validate_delivery — an out-of-domain value fails
# the delivery loudly instead of flowing through as a silent string
# (the engine's slice of the reference's full-XSD e2e validation,
# DeliveryPublicationStreamToGeoJsonTest.java:60-72). Each set carries
# the XSD's own 'other'/'unknown'/'undefined' members where the
# enumeration declares them.

# StopTypeEnumeration
STOP_PLACE_TYPES = frozenset({
    "onstreetBus", "onstreetTram", "airport", "railStation",
    "metroStation", "busStation", "coachStation", "tramStation",
    "harbourPort", "ferryPort", "ferryStop", "liftStation",
    "vehicleRailInterchange", "taxiStand", "other",
})

# per-mode *SubmodeEnumeration sets, keyed by the prop-span key
SUBMODE_DOMAINS: dict[str, frozenset[str]] = {
    "airSubmode": frozenset({
        "internationalFlight", "domesticFlight", "intercontinentalFlight",
        "domesticScheduledFlight", "shuttleFlight", "intercontinentalCharterFlight",
        "internationalCharterFlight", "roundTripCharterFlight",
        "sightseeingFlight", "helicopterService", "domesticCharterFlight",
        "SchengenAreaFlight", "airshipService", "shortHaulInternationalFlight",
        "canalBarge", "undefined", "unknown", "other",
    }),
    "busSubmode": frozenset({
        "airportLinkBus", "expressBus", "highFrequencyBus", "localBus",
        "mobilityBus", "mobilityBusForRegisteredDisabled", "nightBus",
        "postBus", "railReplacementBus", "regionalBus", "schoolBus",
        "schoolAndPublicServiceBus", "shuttleBus", "sightseeingBus",
        "specialNeedsBus", "demandAndResponseBus", "undefined", "unknown",
        "other",
    }),
    "coachSubmode": frozenset({
        "internationalCoach", "nationalCoach", "shuttleCoach",
        "regionalCoach", "specialCoach", "sightseeingCoach",
        "touristCoach", "commuterCoach", "undefined", "unknown", "other",
    }),
    "funicularSubmode": frozenset({
        "funicular", "streetCableCar", "allFunicularServices",
        "undefined", "unknown", "other",
    }),
    "metroSubmode": frozenset({
        "metro", "tube", "urbanRailway", "undefined", "unknown", "other",
    }),
    "railSubmode": frozenset({
        "local", "highSpeedRail", "suburbanRailway", "regionalRail",
        "interregionalRail", "longDistance", "international",
        "sleeperRailService", "nightRail", "carTransportRailService",
        "touristRailway", "airportLinkRail", "railShuttle",
        "replacementRailService", "specialTrain", "crossCountryRail",
        "rackAndPinionRailway", "undefined", "unknown", "other",
    }),
    "tramSubmode": frozenset({
        "cityTram", "localTram", "regionalTram", "sightseeingTram",
        "shuttleTram", "trainTram", "undefined", "unknown", "other",
    }),
    "telecabinSubmode": frozenset({
        "telecabin", "cableCar", "lift", "chairLift", "dragLift",
        "telecabinLink", "undefined", "unknown", "other",
    }),
    "waterSubmode": frozenset({
        "internationalCarFerry", "nationalCarFerry", "regionalCarFerry",
        "localCarFerry", "internationalPassengerFerry",
        "nationalPassengerFerry", "regionalPassengerFerry",
        "localPassengerFerry", "postBoat", "trainFerry",
        "roadFerryLink", "airportBoatLink", "highSpeedVehicleService",
        "highSpeedPassengerService", "sightseeingService", "schoolBoat",
        "cableFerry", "riverBus", "scheduledFerry", "shuttleFerryService",
        "undefined", "unknown", "other",
    }),
    "snowAndIceSubmode": frozenset({
        "snowMobile", "snowCat", "snowCoach", "terrainBus",
        "windsled", "undefined", "unknown", "other",
    }),
}

# ParkingVehicleEnumeration (ParkingVehicleTypes is a space-separated
# list of these)
PARKING_VEHICLE_TYPES = frozenset({
    "pedalCycle", "moped", "motorcycle", "motorcycleWithSidecar",
    "motorScooter", "twoWheeledVehicle", "threeWheeledVehicle", "car",
    "smallCar", "passengerCar", "largeCar", "fourWheelDrive", "taxi",
    "camperCar", "carWithTrailer", "carWithCaravan", "minibus", "bus",
    "van", "largeVan", "highSidedVehicle", "lightGoodsVehicle",
    "heavyGoodsVehicle", "truck", "agriculturalVehicle", "tanker",
    "tram", "articulatedVehicle", "vehicleWithTrailer",
    "lightGoodsVehicleWithTrailer", "heavyGoodsVehicleWithTrailer",
    "allPassengerVehicles", "all", "undefined", "other", "unknown",
})

# CoveredEnumeration
COVERED_VALUES = frozenset({"indoors", "outdoors", "covered", "mixed"})

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
