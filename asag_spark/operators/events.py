"""Event-stream relational operators: as-of join (two implementations)
and per-user top-k.

The as-of join is the canonical "operator Spark lacks" case (SURVEY.md
§2.3 '(absent) as-of/range/theta joins'); per the custom-operator
preference order it is implemented first as a composition of built-in
ops (union + window last(ignorenulls) — one shuffle on user_id, stays
in codegen) and second as a cogroup/applyInPandas pandas.merge_asof —
both semantically identical, cross-checked against a DuckDB ASOF JOIN
oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_window(events: DataFrame, probe_type: str = "purchase",
                     build_type: str = "signup") -> DataFrame:
    """For each probe event: the same user's most recent build event at
    or before it. Built-ins only: sort-per-user window carrying the
    last non-null build timestamp forward.

    Output: (event_id, user_id, ts, matched_ts) — matched_ts null when
    no prior build event exists.
    """
    tagged = events.filter(
        F.col("event_type").isin(probe_type, build_type)
    ).select("event_id", "user_id", "ts", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "matched_ts",
        F.last(
            F.when(F.col("event_type") == build_type, F.col("ts")),
            ignorenulls=True,
        ).over(w),
    )
    return carried.filter(F.col("event_type") == probe_type).select(
        "event_id", "user_id", "ts", "matched_ts"
    )


def asof_join_pandas(events: DataFrame, probe_type: str = "purchase",
                     build_type: str = "signup") -> DataFrame:
    """Same semantics via cogroup().applyInPandas(pandas.merge_asof) —
    the Arrow-batched custom-operator escape hatch (per-group pandas,
    one shuffle on user_id)."""
    probes = events.filter(F.col("event_type") == probe_type).select(
        "event_id", "user_id", "ts"
    )
    builds = events.filter(F.col("event_type") == build_type).select(
        "user_id", F.col("ts").alias("build_ts")
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "user_id": pd.Series(dtype="int64"),
                 "ts": pd.Series(dtype="datetime64[us]"),
                 "matched_ts": pd.Series(dtype="datetime64[us]")}
            )
        left = left.sort_values("ts")
        right = right.sort_values("build_ts")
        out = pd.merge_asof(
            left, right[["build_ts"]],
            left_on="ts", right_on="build_ts", direction="backward",
        )
        out = out.rename(columns={"build_ts": "matched_ts"})
        return out[["event_id", "user_id", "ts", "matched_ts"]]

    return (
        probes.groupBy("user_id")
        .cogroup(builds.groupBy("user_id"))
        .applyInPandas(
            merge,
            schema="event_id long, user_id long, ts timestamp, matched_ts timestamp",
        )
    )


def topk_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k events by value per user (window row_number — O4/top-k)."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("user_id", "event_id", F.col("rk").cast("int").alias("rk"),
                F.round("value", 2).alias("value"))
    )
