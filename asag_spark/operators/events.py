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


def range_join_counts(events: DataFrame, window_s: int = 300,
                      probe_type: str = "purchase",
                      build_type: str = "click") -> DataFrame:
    """Bounded-interval range join: for each probe event, how many of
    the same user's build events fall in (ts − window_s, ts]? This is
    the range-join row of SURVEY §2.3 '(absent) as-of/range/theta
    joins' — the "clicks in the 5 minutes before each purchase"
    attribution query.

    Naive spellings either run the inequality as a
    BroadcastNestedLoopJoin (all pairs per user — quadratic for active
    users) or sort both sides globally. The scalable shape is TIME
    BUCKETING: bin both sides to floor(epoch/window_s); a build event
    inside the window can only land in the probe's bin or the one
    before it, so replicating each build row to (bin, bin+1) and
    equi-joining on (user_id, bin) bounds the candidate set to two
    buckets per probe — a plain shuffled hash/sort-merge join whose
    fan-out is the per-(user, window) event density, independent of
    total history length. The exact (ts−w, ts] predicate rides in the
    join condition; each build row matches at most once because its
    two replicas carry distinct bins. LEFT join keeps zero-click
    probes (n_clicks = 0).

    Output: (event_id, user_id, ts, n_clicks)."""
    if window_s < 1:
        raise ValueError(f"window_s must be >= 1, got {window_s}")
    step = window_s * 1_000_000
    # parquet ts is TIMESTAMP_NTZ; the session tz is pinned to UTC
    # (session.py), so cast-to-TIMESTAMP is a fixed monotone shift —
    # and binning only needs the SAME mapping on both sides anyway
    bin_expr = f"unix_micros(cast(ts as timestamp)) div {step}"
    probe = events.filter(F.col("event_type") == probe_type).select(
        "event_id", "user_id", "ts",
        F.expr(bin_expr).alias("_bin"),
    )
    build = events.filter(F.col("event_type") == build_type).select(
        F.col("user_id").alias("_b_user"),
        F.col("ts").alias("_b_ts"),
        F.explode(
            F.array(F.expr(bin_expr), F.expr(f"{bin_expr} + 1"))
        ).alias("_bin"),
    )
    cond = (
        (probe["user_id"] == build["_b_user"])
        & (probe["_bin"] == build["_bin"])
        & (build["_b_ts"] > probe["ts"] - F.expr(f"INTERVAL {window_s} SECOND"))
        & (build["_b_ts"] <= probe["ts"])
    )
    return (
        probe.join(build, cond, "left")
        .groupBy("event_id", probe["user_id"], probe["ts"])
        .agg(F.count("_b_ts").alias("n_clicks"))
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


def hourly_anomaly(events: DataFrame, trail: int = 24,
                   min_points: int = 8) -> DataFrame:
    """Per-type hourly volume anomaly: z-score of each hour's event
    count against the TRAILING ``trail`` observations (current hour
    excluded — the monitor must not normalize away the spike it is
    scoring). The ops-dashboard query every event pipeline grows.

    Plan shape: the corpus-sized input collapses FIRST — one
    map-combined groupBy(type, hour) whose output is hours × types
    rows — and the per-type ordered window runs over THAT tiny frame,
    so the few-distinct-types skew that makes per-type windows
    dangerous on raw data (see stratum_cap) is harmless here: window
    input ≤ thousands of rows regardless of corpus size.

    z is null when fewer than ``min_points`` trailing hours exist or
    the trailing stddev is 0. Rounded to 4 dp (mean/stddev are double
    reductions; both engines agree well inside 4 dp).

    Output: (event_type, hour_start, n, z).
    """
    hourly = (
        events.groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(-trail, -1)
    )
    mean = F.avg("n").over(w)
    sd = F.stddev_samp("n").over(w)
    npts = F.count("n").over(w)
    z = F.when(
        (npts >= min_points) & (sd > 0),
        F.round((F.col("n") - mean) / sd, 4),
    )
    return hourly.select("event_type", "hour_start", "n", z.alias("z"))


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention cohort matrix: users grouped by first-seen week
    (cohort), counted per subsequent activity week — the
    product-analytics staple. Two aggregations, both map-combined:
    first-seen via min(ts) per user (one shuffle on user_id), then the
    (cohort_week, activity_week) distinct-user counts (one shuffle on
    the week pair; distinct users per pair via the two-level groupBy,
    never a count(DISTINCT) over raw events).

    week = date_trunc('week', ts) — ISO Monday weeks in both engines.

    Output: (cohort_week, week, n_users, week_offset) — week_offset in
    whole weeks, 0 = the cohort's own week.
    """
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .withColumn(
            "week_offset",
            F.floor(
                (F.unix_timestamp("week") - F.unix_timestamp("cohort_week"))
                / F.lit(604800)
            ).cast("int"),
        )
    )


def funnel_steps(events: DataFrame,
                 steps: tuple[str, ...] = ("view", "click", "purchase"),
                 horizon_hours: int | None = 72) -> DataFrame:
    """Ordered-sequence funnel (the MATCH_RECOGNIZE-shaped question
    relational engines struggle with): per user, the EARLIEST
    strictly-ordered completion of ``steps`` — t1 = first step-1
    event, t_i = first step-i event strictly after t_{i-1} — with the
    whole sequence inside ``horizon_hours`` of t1 when set. Earliest-
    completion semantics (not any-completion): greedily advancing to
    each step's first qualifying occurrence maximizes the reachable
    depth, so depth is well-defined and deterministic.

    Plan shape: ONE shuffle total. Per-step first-occurrence times
    fold left-to-right as conditional MIN aggregates inside a single
    groupBy(user_id)... except each t_i depends on t_{i-1}, which a
    one-pass agg cannot see — so the engine instead aggregates the
    per-user SORTED event array once (collect_list of (ts, type)
    structs, array_sort — per-user event counts are bounded in
    practice; the same contract as sessionization) and derives every
    t_i with one array fold per step (pure codegen HOFs, no Python).
    Equivalent chained-aggregation SQL (step-by-step conditional MINs
    with correlated thresholds) is the DuckDB oracle — agreement
    checks the fold against the relational formulation.

    Output: (user_id, depth, t1, t_last) — depth = completed steps
    (0 if the user never did step 1... such users still appear),
    t1/t_last the completion envelope (null when depth = 0).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.filter(F.col("event_type").isin(*steps)).select(
        "user_id", F.struct("ts", "event_type").alias("e")
    )
    agg = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list("e")).alias("seq")
    )
    # t_i = min ts of events with type steps[i] and ts > t_{i-1}
    # (strictly after; ties on identical ts do NOT advance the funnel)
    def _first_of(step):
        return lambda x: x["event_type"] == F.lit(step)

    def _first_after(step, tp):
        return lambda x: (x["event_type"] == F.lit(step)) & (x["ts"] > tp)

    t_prev = None
    for i, s in enumerate(steps):
        pred = _first_of(s) if t_prev is None else _first_after(s, t_prev)
        cand = F.filter(F.col("seq"), pred)
        agg = agg.withColumn(
            f"_t{i}", F.try_element_at(cand, F.lit(1))["ts"]
        )
        t_prev = F.col(f"_t{i}")
    if horizon_hours is not None:
        # completion clock starts at t1: step i counts only if within
        # the horizon; a too-late step truncates the depth there
        bound = F.col("_t0") + F.expr(f"INTERVAL {int(horizon_hours)} HOURS")
        for i in range(1, len(steps)):
            agg = agg.withColumn(
                f"_t{i}",
                F.when(F.col(f"_t{i}") <= bound, F.col(f"_t{i}")),
            )
            # re-truncate the chain: a null t_i kills every later step
            for j in range(i + 1, len(steps)):
                agg = agg.withColumn(
                    f"_t{j}",
                    F.when(F.col(f"_t{i}").isNotNull(), F.col(f"_t{j}")),
                )
    depth = F.lit(0)
    t_last = F.lit(None).cast("timestamp")
    for i in range(len(steps)):
        depth = F.when(F.col(f"_t{i}").isNotNull(), i + 1).otherwise(depth)
        t_last = F.when(
            F.col(f"_t{i}").isNotNull(), F.col(f"_t{i}")
        ).otherwise(t_last)
    return agg.select(
        "user_id",
        depth.cast("int").alias("depth"),
        F.col("_t0").alias("t1"),
        t_last.alias("t_last"),
    )
