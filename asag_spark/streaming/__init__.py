"""Structured Streaming operators over the events table.

The reference is a pure daily batch job (SURVEY.md §2.7 — no stream
processing), so streaming here covers the engine-generalization axis:
the same event schema consumed incrementally with watermarked windowed
aggregation, runnable in tests with the availableNow trigger against
the parquet directory (file source = replayable, checkpointable).

At scale this is the standard pattern: readStream from the table
location, event-time tumbling windows with a watermark bounding state,
partial aggregation map-side before the stateful exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h event-time windows per event_type; the watermark
    bounds state so late data beyond 2h is dropped (deterministic with
    availableNow replay of a static directory)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def tile_density_stream(
    events: DataFrame,
    zoom: int = 6,
    watermark: str = "2 hours",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Streaming tile density: hourly tumbling-window counts per
    Web-Mercator tile — the live-map ingest pattern (vehicle pings →
    per-tile activity). The tile assignment is the same codegen'd
    projection the batch path uses (geo/xyz), so it costs nothing
    extra per micro-batch; the watermark bounds the windowed state and
    the stateful exchange is keyed (window, x, y), which inherits the
    cell skew story — partial aggregation collapses hot tiles map-side
    before the shuffle."""
    from ..geo.xyz import tile_x, tile_y

    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            tile_x(F.col(lon_col), zoom).alias("x"),
            tile_y(F.col(lat_col), zoom).alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("hour_start"), "x", "y", "n")
    )


def run_available_now(stream_df: DataFrame, checkpoint_dir: str,
                      table_name: str, output_mode: str = "complete") -> None:
    """Drain everything currently in the source into a memory sink —
    the test/bench harness entry; production would writeStream to the
    lake with the same checkpoint contract. ``output_mode``: complete
    for the windowed aggregations, append for row-level stateful ops
    (dedup) which complete mode rejects."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


SESSION_OUT_SCHEMA = (
    "user_id long, session_seq long, session_start timestamp, "
    "session_end timestamp, n_events long, sum_value double"
)
SESSION_STATE_SCHEMA = (
    "session_seq long, start_us long, last_us long, n long, sv double"
)


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful streaming sessionization via
    ``applyInPandasWithState`` — the arbitrary-state API the engine
    exposes for operators that watermarked windows can't express
    (asag itself has no streaming, SURVEY.md §2.7; this is the
    engine-generalization axis).

    State per user: the open session (seq, start, last-event, count,
    value-sum) carried across micro-batches. Each batch folds its
    events (sorted by event time) into the open session, emits every
    CLOSED session exactly once, and emits a snapshot of the
    still-open session at batch end. A session that spans batches
    therefore appears once per batch with growing ``n_events`` —
    consumers keep the last snapshot per (user_id, session_seq)
    (max ``n_events``), which a single availableNow drain makes
    trivially exact (one batch ⇒ one snapshot ⇒ output equals batch
    sessionization row-for-row; the oracle relies on this).

    Scale notes: state is O(1) per user (five scalars); the only
    shuffle is the groupBy(user_id) exchange Spark plans for the
    stateful operator; per-group work is vectorized pandas. In a
    continuous production run you would add an event-time timeout to
    finalize idle sessions instead of end-of-stream snapshots.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        if state.exists:
            seq, start_us, last_us, n, sv = state.get
        else:
            seq, start_us, last_us, n, sv = 0, None, None, 0, 0.0
        closed = []
        # normalize to us regardless of the Arrow-side unit (ns vs us)
        ts_us = rows["ts"].astype("datetime64[us]").astype("int64")
        for us, val in zip(ts_us, rows["value"]):
            us = int(us)
            if last_us is None or us - last_us > gap_us:
                if last_us is not None:
                    closed.append((seq, start_us, last_us, n, sv))
                seq += 1
                start_us, n, sv = us, 0, 0.0
            last_us = us
            n += 1
            sv += float(val)
        state.update((seq, start_us, last_us, n, sv))
        out = closed + ([(seq, start_us, last_us, n, sv)] if n else [])
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out),
                "session_seq": [o[0] for o in out],
                "session_start": pd.to_datetime([o[1] for o in out], unit="us"),
                "session_end": pd.to_datetime([o[2] for o in out], unit="us"),
                "n_events": [o[3] for o in out],
                "sum_value": [round(o[4], 2) for o in out],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization (windowed gap logic — the session_window
    streaming equivalent): consecutive events of a user belong to one
    session when separated by < gap. Pure built-in window functions."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # TIMESTAMP_NTZ has no direct long cast in Spark 4; hop via TIMESTAMP
    # (same session-tz offset on both sides, so deltas are exact)
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = F.lag(secs).over(w)
    new_session = (
        secs - F.coalesce(gap, F.lit(0)) > gap_minutes * 60
    ).cast("int")
    sess_id = F.sum(new_session).over(
        Window.partitionBy("user_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.withColumn("session_seq", sess_id)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact-dedup on event_id with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` evicts a key once the watermark
    passes its event time + delay — the plain streaming
    ``dropDuplicates`` holds every key forever, which is the 100 TB
    streaming killer (state ∝ all history instead of ∝ the watermark
    horizon). A duplicate either finds its key live in state (dropped
    as dup) or arrives with ts older than the watermark (dropped as
    late) — eviction requires watermark > ts + delay while non-late
    requires watermark < ts, so no duplicate can slip through.
    Deterministic on replayed input: duplicates are identical rows, so
    whichever copy survives, the output SET equals the distinct
    input."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


DOCS_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def lsh_dedup_stream(docs_stream: DataFrame, bucket_table: str,
                     pairs_out: str, checkpoint_dir: str) -> None:
    """Streaming NEAR-dup detection: each microbatch is minhashed ONCE
    and probed against the persisted band-bucket table (the
    `minhash_band_buckets` index), emitting candidate pairs that
    involve at least one batch doc, then appending the batch's buckets
    to the index — the streaming composition of
    `dedup.lsh_candidate_pairs_incremental`.

    Why foreachBatch and not a stateful operator: the dedup index is
    corpus-sized (10^12 band-bucket rows) — it belongs in table
    storage with bucketed layout, not in stream state (watermark-bound
    state stores cannot hold unbounded history; the exact-dedup
    `dedup_stream` above is the bounded-state tool for key dedup,
    near-dup needs the table). Each batch does: one map-side minhash
    of the BATCH only, one probe join against the index, one append.

    Exactness: the final pair set over N batches equals the batch
    `lsh_candidate_pairs` over the full corpus (parity-tested) —
    signatures are per-doc functions, so batch boundaries do not
    change them, and every pair is found in the batch that completes
    it. Replay caveat (documented, standard foreachBatch contract):
    the appends are idempotent only per-batch-id; production sinks
    key the append on batch_id (e.g. Iceberg overwrite-by-filter) —
    at-least-once is acceptable here because pairs are a SET
    (downstream distinct) and bucket rows are re-probed identically.
    """
    from ..operators.dedup import (
        lsh_candidate_pairs_incremental, minhash_band_buckets,
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            corpus = spark.read.parquet(bucket_table)
        except Exception:  # noqa: BLE001 — first batch: no index yet
            corpus = spark.createDataFrame(
                [], "doc_id long, band int, bkey string"
            )
        inc = lsh_candidate_pairs_incremental(corpus, batch_df)
        inc.write.mode("append").parquet(pairs_out)
        minhash_band_buckets(batch_df).write.mode("append").parquet(
            bucket_table
        )

    (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def gap_density_stream(
    points: DataFrame,
    zones: DataFrame,
    zoom: int = 6,
    watermark: str = "2 hours",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Streaming coverage-gap monitor: hourly per-tile counts of points
    that fall inside NO zone polygon — the live alert surface for
    pip_anti_join ("pings outside every tariff zone are appearing in
    tile X"). The membership bit comes from pip.pip_flag_join, whose
    broadcast ray-cast kernel is STATELESS and therefore legal inside
    a streaming plan (the zone index rides the broadcast exactly as in
    batch); only the downstream windowed count is stateful, with the
    same (window, x, y) keyed exchange + watermark bound as
    tile_density_stream.

    Streaming-batch parity is the contract: availableNow over a staged
    directory must equal the batch pipeline on the same rows
    (tests/test_streaming_checkpoint.py)."""
    from ..geo.xyz import tile_x, tile_y
    from ..operators.pip import pip_flag_join

    flagged = pip_flag_join(points, zones, lon_col=lon_col, lat_col=lat_col)
    return (
        flagged.filter(~F.col("covered"))
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            tile_x(F.col(lon_col), zoom).alias("x"),
            tile_y(F.col(lat_col), zoom).alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("n_uncovered"))
        .select(F.col("w.start").alias("hour_start"), "x", "y", "n_uncovered")
    )


def checks_stream(events: DataFrame, rules: list[dict],
                  watermark: str = "2 hours",
                  ts_col: str = "ts") -> DataFrame:
    """Streaming data-quality monitor: the table_checks contract
    (operators/checks.py) evaluated PER HOURLY EVENT-TIME WINDOW —
    the live surface for "null user_ids started appearing at 14:00" /
    "event volume dropped below the floor this hour". The rule
    compilation is shared verbatim with the batch operator
    (_rule_aggs/_readout); only the grouping differs: conditional
    aggregates are stateless per-row expressions, so the only
    stateful piece is the same (window)-keyed agg + watermark bound
    every windowed count here uses. min_rows becomes a PER-WINDOW
    volume floor. The exact 'unique' rule is rejected loudly
    (streaming aggregation cannot plan a distinct aggregate);
    'approx_unique' (HLL, mergeable, streaming-legal) is first-class.

    Output: (hour_start, rule_id, rule, column, observed, expected,
    passed) — one row per (window, rule). Batch parity: availableNow
    over a static directory equals the batch groupBy(window) on the
    same rows (test-gated), so the monitor carries the same oracle
    discipline as the other streaming operators.

    Known limit (inherent to event-time grouping, documented rather
    than papered over): a window with ZERO events emits NO row — so
    total silence upstream produces no min_rows failure row for the
    silent hour. Absent-window detection needs a clock the data does
    not carry: run a heartbeat source unioned into the stream, or a
    downstream gap check over hour_start (events.funnel/anomaly
    family), which this operator deliberately does not smuggle in.
    """
    from ..operators.checks import _readout, _rule_aggs, _validate_rules

    _validate_rules(rules, exact_unique_ok=False)
    agg = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("w"))
        .agg(*_rule_aggs(rules))
    )
    return agg.select(
        F.col("w.start").alias("hour_start"),
        F.explode(F.array(*_readout(rules))).alias("r"),
    ).select("hour_start", "r.*")
