"""asag_spark — a PySpark-native spatial-join + tiling engine.

Built from scratch (NOT a port) with the query/data-processing
capabilities of the entur/asag NeTEx stop-place → GeoJSON pipeline,
generalized to web scale per SURVEY.md:

* input: an Iceberg-style table of interleaved text+media documents
  ``docs(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
* span extraction via built-in ``pyspark.sql.functions`` (JVM-side) and
  Arrow-vectorized pandas UDFs only where built-ins can't express it
* asag entity semantics: temporal validity filter, geometry-presence
  filter, zone/stop/quay/parking/tariff-zone projections, adjacency
  broadcast self-join → ``finalStopPlaceType``
* H3-style res-7..10 hex cells + S2 covering cells, point-in-polygon
  joins, kNN nearest-stop, GeoJSON tile assembly
* large-scale training-data ops: dedup (exact/minhash/simhash),
  similarity search, text quality, multimodal span plumbing

Reference semantics are cited per-function as
``/root/reference/<file>:<line>`` so parity can be audited. No code is
copied from the reference (it is Java/Camel; this is Spark-first).
"""

__version__ = "0.1.0"
