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
