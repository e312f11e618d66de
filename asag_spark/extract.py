"""Span → typed-entity extraction (SURVEY.md §1.3, S4).

The reference does a selective StAX scan that materializes only
StopPlace/Parking/TariffZone elements
(/root/reference/src/main/java/org/entur/asag/mapbox/
DeliveryPublicationStreamToGeoJson.java:95-125). Here the docs table is
columnar and extraction is pure JVM relational expressions
(:func:`extract_entities`): three one-pass span traversals (one
``filter`` per span kind), a single ``str_to_map`` fold of the prop
spans, and codegen'd map lookups per canonical key.

Formulations measured on 10M docs (identical output, exceptAll-checked):

* per-field HOF traversals (~35 interpreted passes over the span
  array): 22 s at 16 cores — CodegenFallback re-interprets the lambda
  tree per element AND Catalyst inlines the multi-referenced alias
  into every consumer;
* ``mapInArrow`` index-scatter kernel (kept as
  :func:`extract_entities_arrow`): fastest per-core on an unloaded
  box, but the JVM→Python→JVM Arrow round-trip of every span text is
  memory-bandwidth it cannot afford at full occupancy on a
  bandwidth-capped host (hypervisor steal 25 s during a 10 s 16-core
  run; 4→16-core scaling 0.54);
* str_to_map JVM path (the default): ~same wall at 16 cores, near-zero
  steal, no Python workers, and the ``spans`` passthrough column is
  free because it never leaves the JVM.

Per-row invariant (input_hint): the original ``spans`` array rides
through unchanged so span-sequence equality can be asserted on any
downstream output.

``props`` is a typed struct over the fixed NeTEx property key set
(schema.ENTITY_PROP_KEYS) rather than map<string,string>: every
consumer reads known keys, struct field access is O(1) whole-stage
codegen, and null means "property absent".
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schema import ENTITY_PROP_KEYS, SPAN


def _first_pos(n: int, rows: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Per doc row, the flat-span position of its FIRST matching span
    (the reference's findFirst semantics), -1 where none. Assign
    reversed so earlier spans overwrite later ones."""
    dest = np.full(n, -1, dtype=np.int64)
    dest[rows[::-1]] = pos[::-1]
    return dest


def _take_at(texts, src: np.ndarray):
    """pc.take with -1 → null: gather each doc's span text (or value)
    by precomputed position — no Python-object materialization."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.take(texts, pa.array(src, mask=src < 0, type=pa.int64()))


def _extract_batches(batches, prop_keys=ENTITY_PROP_KEYS, spans_through=True):
    """Index-scatter kernel: every span is classified ONCE (one
    split_pattern + one index_in over the flat span buffer), matched
    span *positions* are scattered first-wins into per-column index
    vectors, and output columns are built with ``pc.take`` — all Arrow
    C++; no per-key prefix scans, no object arrays. (The previous
    per-key ``starts_with``+filter+object-scatter kernel did ~3 passes
    per prop key over the flat buffer and one Python-object column
    conversion per key — measured 1.9× more CPU per batch and, from the
    allocation storm, a 1.47× per-core CPU inflation at 16 concurrent
    tasks.)"""
    import pyarrow as pa
    import pyarrow.compute as pc

    key_set = pa.array(list(prop_keys), type=pa.string())
    n_keys = len(prop_keys)

    for batch in batches:
        doc_id = batch.column(0)
        spans = batch.column(1)
        n = len(spans)
        lens = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype("float64"), nan=0.0).astype(np.int64)
        vals = spans.flatten()
        kinds = vals.field("kind")
        texts = vals.field("text")
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)

        kind_np = kinds.to_numpy(zero_copy_only=False)
        meta_np = kind_np == "meta"
        geom_np = kind_np == "geom"
        prop_np = kind_np == "prop"

        # meta: first meta span per doc, then one regex pass per field
        # over the n-length (per-doc) gather — not over every span
        meta_src = _first_pos(n, row_idx[meta_np], np.nonzero(meta_np)[0])
        meta_texts = _take_at(texts, meta_src)
        meta_cols = {}
        for field in ("entity_type", "id", "version"):
            ext = pc.extract_regex(meta_texts, f"{field}=(?P<v>[^;]*)")
            meta_cols[field] = ext.field("v")

        geom_col = _take_at(
            texts, _first_pos(n, row_idx[geom_np], np.nonzero(geom_np)[0])
        )

        # props: split each prop span ONCE at the first '=' (values may
        # contain '=' — KeyValuesHelper-style split semantics), map keys
        # to canonical indices with one index_in, scatter positions
        # first-wins into an (n_keys × n) index matrix, take per key.
        prop_pos = np.nonzero(prop_np)[0]
        src_mat = np.full((n_keys, n), -1, dtype=np.int64)
        if len(prop_pos):
            ptexts = pc.take(texts, pa.array(prop_pos, type=pa.int64()))
            split = pc.split_pattern(ptexts, "=", max_splits=1)
            ok = pc.equal(pc.list_value_length(split), 2)
            ok_np = ok.to_numpy(zero_copy_only=False).astype(bool)
            if not ok_np.all():
                split = pc.filter(split, ok)
                prop_pos = prop_pos[ok_np]
            keys = pc.list_element(split, 0)
            pvals = pc.list_element(split, 1)
            kidx = pc.index_in(keys, value_set=key_set)
            kv = kidx.fill_null(-1).to_numpy(zero_copy_only=False)
            known = kv >= 0
            rows_v = row_idx[prop_pos][known]
            keys_v = kv[known]
            pos_v = np.nonzero(known)[0]
            src_mat[keys_v[::-1], rows_v[::-1]] = pos_v[::-1]
            prop_cols = [_take_at(pvals, src_mat[i]) for i in range(n_keys)]
        else:
            null_col = pa.nulls(n, type=pa.string())
            prop_cols = [null_col] * n_keys

        props_arr = pa.StructArray.from_arrays(prop_cols, names=list(prop_keys))
        arrays = [
            doc_id,
            meta_cols["entity_type"],
            meta_cols["id"],
            meta_cols["version"],
            props_arr,
            geom_col,
        ]
        names = ["doc_id", "entity_type", "id", "version", "props", "geom_wkt"]
        if spans_through:
            arrays.append(spans)
            names.append("spans")
        yield pa.RecordBatch.from_arrays(arrays, names=names)


def extract_entities(
    docs: DataFrame,
    prop_keys: tuple[str, ...] = ENTITY_PROP_KEYS,
    spans_through: bool = True,
) -> DataFrame:
    """docs(doc_id, spans) → typed entity frame (schema.ENTITIES) —
    pure-JVM implementation (no Python round-trip).

    meta span: ``entity_type=X;id=Y;version=Z`` → discriminator columns
    (the reference's polymorphic instanceof dispatch, F3 —
    PublicationDeliveryHelper.java:60-61 — collapses to a column).
    prop spans: ``key=value`` → typed ``props`` struct. geom span: WKT
    passthrough. First span of a kind wins (findFirst semantics).

    Why JVM rather than the Arrow kernel (kept as
    ``extract_entities_arrow``): this host hard-caps memory bandwidth
    per guest (BENCH/BASELINE.md hardware probes: a pure-memcpy probe
    scales 4→16 cores at 0.46 with hypervisor steal exploding, vs 0.91
    for pure ALU), and the mapInArrow round-trip ships every span text
    JVM→Python→JVM — measured 25 steal-sec during a 10 s 16-core run.
    The JVM formulation classifies spans with THREE one-pass
    higher-order traversals (filter per kind), folds the prop spans
    into one ``str_to_map``, and reads canonical keys with codegen'd
    map lookups. Identical output (exceptAll-verified on 10M docs) with
    zero IPC; the ``spans`` passthrough column (input_hint invariant)
    is free — it never leaves the JVM.

    First-wins semantics: the prop array is ``reverse``d before
    ``str_to_map`` and the session pins
    ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (session.py), so the FIRST
    occurrence of a duplicate key wins, matching the reference's
    findFirst. Values may contain '=' (split at the first '=' only —
    KeyValuesHelper semantics); the span encoding reserves the ASCII
    record separator 0x1E as the pair delimiter.

    ``prop_keys`` narrows the emitted props struct; unlike the Arrow
    kernel this is just a smaller projection — Catalyst prunes unread
    map lookups automatically either way.
    """
    s = F.col("spans")

    def texts_of(kind: str) -> Column:
        return F.transform(
            F.filter(s, lambda x: x["kind"] == kind), lambda x: x["text"]
        )

    # F.get (0-based) returns null out-of-bounds — ANSI element_at
    # throws on docs lacking the span kind (e.g. geometry-less zones)
    meta = F.get(texts_of("meta"), 0)
    mm = F.str_to_map(meta, F.lit(";"), F.lit("="))
    geom = F.get(texts_of("geom"), 0)
    pm = F.str_to_map(
        F.array_join(F.reverse(texts_of("prop")), "\x1e"),
        F.lit("\x1e"),
        F.lit("="),
    )
    props = F.struct(*[pm[k].alias(k) for k in prop_keys])

    cols = [
        "doc_id",
        mm["entity_type"].alias("entity_type"),
        mm["id"].alias("id"),
        mm["version"].alias("version"),
        props.alias("props"),
        geom.alias("geom_wkt"),
        F.to_timestamp_ntz(pm["validFrom"]).alias("valid_from"),
        F.to_timestamp_ntz(pm["validTo"]).alias("valid_to"),
    ]
    if spans_through:
        cols.append("spans")
    return docs.select(*cols)


def extract_entities_arrow(
    docs: DataFrame,
    prop_keys: tuple[str, ...] = ENTITY_PROP_KEYS,
    spans_through: bool = True,
) -> DataFrame:
    """Arrow-kernel variant of :func:`extract_entities` (index-scatter
    ``mapInArrow`` over the flat span buffers). Same output, checked by
    tests/test_features.py parity. Kept as the template for span
    payloads that genuinely need Python (e.g. binary media decode,
    operators/media.py) — for the plain text encoding the JVM path
    wins on this host's bandwidth-capped cores (see extract_entities
    docstring).

    ``prop_keys`` / ``spans_through`` prune the KERNEL OUTPUT — the
    manual equivalent of column pruning, which Catalyst cannot push
    through an opaque mapInArrow (the Python side always materializes
    and Arrow-transfers its full declared schema; the JVM discards
    pruned columns only after the transfer).
    """
    from pyspark.sql import types as T

    fields = [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("version", T.StringType(), True),
        T.StructField(
            "props",
            T.StructType(
                [T.StructField(k, T.StringType(), True) for k in prop_keys]
            ),
            True,
        ),
        T.StructField("geom_wkt", T.StringType(), True),
    ]
    if spans_through:
        fields.append(
            T.StructField("spans", T.ArrayType(SPAN, containsNull=False), False)
        )
    out_schema = T.StructType(fields)

    def run(batches):
        return _extract_batches(
            batches, prop_keys=prop_keys, spans_through=spans_through
        )

    parsed = docs.select("doc_id", "spans").mapInArrow(run, out_schema)
    cols = [
        "doc_id",
        "entity_type",
        "id",
        "version",
        "props",
        "geom_wkt",
        F.to_timestamp_ntz(F.col("props")["validFrom"]).alias("valid_from"),
        F.to_timestamp_ntz(F.col("props")["validTo"]).alias("valid_to"),
    ]
    if spans_through:
        cols.append("spans")
    return parsed.select(*cols)


def keylist_value(props: Column, key: str) -> Column:
    """First value for ``key`` in the keyList prop ('k:v|k2:v2'; values
    may contain ':'). Mirrors KeyValuesHelper.getValueByKey
    (/root/reference/.../mapper/KeyValuesHelper.java:28-39): first
    match wins, absent → null (property not set).

    Regex-based rather than filter()+substring: a higher-order
    ``filter`` is CodegenFallback (interpreted per row in the feature
    projection's hot path); ``rlike``/``regexp_extract`` stay in
    whole-stage codegen. ``key`` is a fixed NeTEx key identifier
    ([A-Z_]+ — no regex metacharacters).
    """
    kl = props["keyList"]
    pat = "(^|\\|)" + key + ":([^|]*)"
    return F.when(kl.rlike(pat), F.regexp_extract(kl, pat, 2))
