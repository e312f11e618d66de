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


def run_available_now(stream_df: DataFrame, checkpoint_dir: str,
                      table_name: str) -> None:
    """Drain everything currently in the source into a memory sink —
    the test/bench harness entry; production would writeStream to the
    lake with the same checkpoint contract."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


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
