"""As-of join semantics on a constructed case + window/pandas parity."""

from pyspark.sql import functions as F

ROWS = [
    # user 7: signup at 10:00, purchases at 09:00 (before → null),
    # 10:30 and 11:00 (both match 10:00); second signup 10:45 → 11:00
    # matches 10:45
    (1, "2024-01-01 09:00:00", 7, "purchase", 5.0, "{}"),
    (2, "2024-01-01 10:00:00", 7, "signup", 0.0, "{}"),
    (3, "2024-01-01 10:30:00", 7, "purchase", 6.0, "{}"),
    (4, "2024-01-01 10:45:00", 7, "signup", 0.0, "{}"),
    (5, "2024-01-01 11:00:00", 7, "purchase", 7.0, "{}"),
    # user 8: purchase with no signup at all
    (6, "2024-01-01 12:00:00", 8, "purchase", 8.0, "{}"),
]


def _events(spark):
    return spark.createDataFrame(
        ROWS,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))


def _expected():
    return {
        1: None,
        3: "2024-01-01 10:00:00",
        5: "2024-01-01 10:45:00",
        6: None,
    }


def test_asof_window(spark):
    from asag_spark.operators.events import asof_join_window

    out = {r["event_id"]: (str(r["matched_ts"]) if r["matched_ts"] else None)
           for r in asof_join_window(_events(spark)).collect()}
    assert out == _expected()


def test_asof_pandas_matches_window(spark):
    from asag_spark.operators.events import asof_join_pandas, asof_join_window

    a = {r["event_id"]: r["matched_ts"]
         for r in asof_join_window(_events(spark)).collect()}
    b = {r["event_id"]: r["matched_ts"]
         for r in asof_join_pandas(_events(spark)).collect()}
    assert a == b


def test_topk_per_user(spark):
    from asag_spark.operators.events import topk_per_user

    out = topk_per_user(_events(spark), k=2).collect()
    u7 = sorted([r for r in out if r["user_id"] == 7], key=lambda r: r["rk"])
    assert [r["event_id"] for r in u7] == [5, 3]  # values 7.0, 6.0


# --- bounded-interval range join -------------------------------------

RANGE_ROWS = [
    # user 7: purchase at 10:00; clicks at 09:54:59 (301 s before —
    # out), 09:55:00 (exactly 300 s — out, interval is half-open),
    # 09:55:01 (in), 10:00:00 (exactly at ts — in), 10:00:01 (after —
    # out). Bucket boundary: 09:55:01 and 10:00 land in DIFFERENT
    # 300-s bins, so the bin+1 replica is what finds it.
    (1, "2024-01-01 10:00:00", 7, "purchase", 5.0, "{}"),
    (2, "2024-01-01 09:54:59", 7, "click", 0.0, "{}"),
    (3, "2024-01-01 09:55:00", 7, "click", 0.0, "{}"),
    (4, "2024-01-01 09:55:01", 7, "click", 0.0, "{}"),
    (5, "2024-01-01 10:00:00", 7, "click", 0.0, "{}"),
    (6, "2024-01-01 10:00:01", 7, "click", 0.0, "{}"),
    # user 8: purchase with zero clicks anywhere — LEFT join keeps it
    (7, "2024-01-01 12:00:00", 8, "purchase", 8.0, "{}"),
    # user 9's click must not leak into user 7's window
    (8, "2024-01-01 09:59:00", 9, "click", 0.0, "{}"),
]


def _range_events(spark):
    return spark.createDataFrame(
        RANGE_ROWS,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_range_join_boundaries(spark):
    from asag_spark.operators.events import range_join_counts

    out = {r["event_id"]: r["n_clicks"]
           for r in range_join_counts(_range_events(spark)).collect()}
    assert out == {1: 2, 7: 0}


def test_range_join_matches_naive_inequality(spark):
    """Parity vs the naive inequality join on a pseudo-random corpus —
    every (user, ts) collision and bin boundary the generator happens
    to produce must agree."""
    from asag_spark.operators.events import range_join_counts

    base = spark.range(400).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.xxhash64("id", F.lit(1)) % 7200 + 7200) % 7200
        ).alias("ts"),
        (F.xxhash64("id", F.lit(2)) % 5 + 5) % 5,
        F.when(F.xxhash64("id", F.lit(3)) % 3 == 0, "purchase")
         .otherwise("click").alias("event_type"),
        F.lit(0.0).alias("value"), F.lit("{}").alias("props"),
    ).withColumnRenamed("((xxhash64(id, 2) % 5) + 5) % 5", "user_id")
    base = base.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    base.createOrReplaceTempView("_rj_events")
    naive = {
        (r["event_id"]): r["n_clicks"]
        for r in spark.sql("""
            SELECT p.event_id, COUNT(c.ts) AS n_clicks
            FROM (SELECT * FROM _rj_events WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT * FROM _rj_events WHERE event_type = 'click') c
              ON c.user_id = p.user_id
             AND c.ts > p.ts - INTERVAL 300 SECOND AND c.ts <= p.ts
            GROUP BY p.event_id
        """).collect()
    }
    fast = {r["event_id"]: r["n_clicks"]
            for r in range_join_counts(base).collect()}
    assert fast == naive and len(fast) > 20


def test_range_join_plan_has_no_nested_loop(spark):
    """The whole point of the time-bucket rewrite: the physical plan
    must be an equi-join (hash/sort-merge), never the
    BroadcastNestedLoopJoin Spark picks for a bare inequality join."""
    from asag_spark.operators.events import range_join_counts

    plan = range_join_counts(_range_events(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hourly_anomaly_spike_detection(spark):
    """A constructed 10x spike after 24 flat hours scores a large
    positive z; the flat hours score ~0 once the window fills; the
    first min_points-1 hours are null (insufficient trailing data)."""
    from datetime import datetime, timedelta

    from asag_spark.operators.events import hourly_anomaly

    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(30):
        # 4/5/6 cycling baseline (sd > 0), 50-event spike at hour 27
        n = 50 if h == 27 else 4 + (h % 3)
        for k in range(n):
            rows.append((eid, base + timedelta(hours=h, minutes=k % 60),
                         1, "click", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r["hour_start"].hour + 24 * (r["hour_start"].day - 1): r["z"]
           for r in hourly_anomaly(ev).collect()}
    assert len(out) == 30
    for h in range(7):          # fewer than min_points trailing hours
        assert out[h] is None, h
    assert out[26] is not None and abs(out[26]) < 2.0  # in-pattern hour
    assert out[27] is not None and out[27] > 10.0      # the spike
    # hour 28: trailing window now CONTAINS the spike → negative z
    assert out[28] is not None and out[28] < 0.0
    # flat-history null guard: a constant series never scores
    flat = spark.createDataFrame(
        [(i, base + timedelta(hours=i), 1, "view", 1.0, "{}")
         for i in range(30)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    assert all(r["z"] is None for r in hourly_anomaly(flat).collect())


def test_retention_cohorts_constructed(spark):
    """Two cohorts with known return patterns: counts and week offsets
    match hand-computed truth; every user counts once per active week."""
    from datetime import datetime, timedelta

    from asag_spark.operators.events import retention_cohorts

    monday = datetime(2024, 1, 1)  # a Monday
    rows, eid = [], 0

    def ev(user, week, dow=0):
        nonlocal eid
        rows.append((eid, monday + timedelta(weeks=week, days=dow),
                     user, "click", 1.0, "{}"))
        eid += 1

    # cohort A (week 0): users 1,2,3 — user 1 returns w1+w2, user 2
    # returns w2 (twice in the week: still one count), user 3 never
    ev(1, 0); ev(2, 0); ev(3, 0)
    ev(1, 1); ev(1, 2)
    ev(2, 2); ev(2, 2, dow=3)
    # cohort B (week 1): user 4 — returns w2
    ev(4, 1); ev(4, 2)
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        (r["cohort_week"].date().isoformat(), r["week_offset"]): r["n_users"]
        for r in retention_cohorts(e).collect()
    }
    assert got == {
        ("2024-01-01", 0): 3,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 2,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_funnel_steps_constructed(spark):
    """Strict ordering, horizon truncation, chain kill, depth-0."""
    from asag_spark.operators.events import funnel_steps

    rows = [
        # u1 completes in order within horizon
        (1, "2024-01-01 00:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-01 01:00:00", 1, "click", 0.0, "{}"),
        (3, "2024-01-01 02:00:00", 1, "purchase", 0.0, "{}"),
        # u2: purchase BEFORE click -> depth 2 (strict order)
        (4, "2024-01-01 00:00:00", 2, "view", 0.0, "{}"),
        (5, "2024-01-01 00:30:00", 2, "purchase", 0.0, "{}"),
        (6, "2024-01-01 01:00:00", 2, "click", 0.0, "{}"),
        # u3: click outside the 72h horizon -> depth 1, and the LATER
        # purchase is killed by the chain even though it exists
        (7, "2024-01-01 00:00:00", 3, "view", 0.0, "{}"),
        (8, "2024-01-05 00:00:00", 3, "click", 0.0, "{}"),
        (9, "2024-01-05 01:00:00", 3, "purchase", 0.0, "{}"),
        # u4: never did step 1 but is in the funnel population
        (10, "2024-01-01 00:00:00", 4, "click", 0.0, "{}"),
        # u5: only non-funnel events -> absent from output
        (11, "2024-01-01 00:00:00", 5, "error", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = {x["user_id"]: x for x in funnel_steps(ev).collect()}
    assert r[1]["depth"] == 3 and str(r[1]["t_last"]).startswith("2024-01-01 02")
    assert r[2]["depth"] == 2  # purchase before click cannot count
    assert r[3]["depth"] == 1 and r[3]["t_last"] == r[3]["t1"]
    assert r[4]["depth"] == 0 and r[4]["t1"] is None
    assert 5 not in r
