"""Unit tests for operators/timeseries.py (gap fill + forward fill,
cohort retention, rolling anomaly) and operators/dedup.py
dedup_against_corpus — literal-data checks of the semantics the
registered oracles then attest at sf0.01."""

from __future__ import annotations

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts_s", "event_type", "value"]).select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value"
    )


def test_gap_fill_ffill_dense_grid_and_fill(spark):
    from lakehouse_spark_spark.operators.timeseries import gap_fill_ffill

    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:10:00", "a", 1.0),
            (1, "2024-01-01 03:20:00", "a", 2.0),  # hours 1,2 missing for a
            (2, "2024-01-01 01:00:00", "b", 5.0),  # b missing hours 0,2,3
        ],
    )
    out = gap_fill_ffill(ev).orderBy("event_type", "bucket_ts").collect()
    # grid: 2 types x 4 hours (00..03) = 8 rows, no holes
    assert len(out) == 8
    a_rows = [r for r in out if r["event_type"] == "a"]
    assert [r["n_events"] for r in a_rows] == [1, 0, 0, 1]
    # forward fill carries hour-0 sum through the gap, then updates
    assert [r["filled_value"] for r in a_rows] == [1.0, 1.0, 1.0, 2.0]
    b_rows = [r for r in out if r["event_type"] == "b"]
    # b has no observation at hour 0 -> filled stays null until first obs
    assert b_rows[0]["filled_value"] is None
    assert [r["filled_value"] for r in b_rows[1:]] == [5.0, 5.0, 5.0]


def test_cohort_retention_shares(spark):
    from lakehouse_spark_spark.operators.timeseries import cohort_retention

    ev = _events(
        spark,
        [
            # cohort Jan: users 1,2 — user 1 returns in Feb
            (1, "2024-01-05 00:00:00", "x", 0.0),
            (2, "2024-01-20 00:00:00", "x", 0.0),
            (1, "2024-02-01 00:00:00", "x", 0.0),
            # cohort Feb: user 3
            (3, "2024-02-10 00:00:00", "x", 0.0),
        ],
    )
    out = {
        (r["cohort_month"].month, r["activity_month"].month): r
        for r in cohort_retention(ev).collect()
    }
    assert out[(1, 1)]["n_users"] == 2 and out[(1, 1)]["retention"] == 1.0
    assert out[(1, 2)]["n_users"] == 1 and out[(1, 2)]["retention"] == 0.5
    assert out[(1, 2)]["months_since"] == 1
    assert out[(2, 2)]["cohort_size"] == 1


def test_rolling_anomaly_excludes_current_day(spark):
    from lakehouse_spark_spark.operators.timeseries import rolling_anomaly

    rows = []
    # 7 quiet days alternating 2/3 events, then a 20-event spike on day 8
    for d in range(1, 8):
        n = 2 if d % 2 == 1 else 3
        rows += [(u, f"2024-01-0{d} 01:00:00", "a", 0.0) for u in range(n)]
    rows += [(u, "2024-01-08 01:00:00", "a", 0.0) for u in range(20)]
    out = {r["day"].day: r for r in rolling_anomaly(_events(spark, rows)).collect()}
    # day 1-3 have <3 trailing observations -> null z
    assert out[3]["z"] is None and out[3]["is_anomaly"] is False
    # the spike is measured against the trailing counts (2,3,2,3,2,3,2),
    # not itself: mean 17/7, sample std ~0.5345 -> z ~ 32.9
    assert out[8]["mean_prev"] == round(17 / 7, 6)
    assert out[8]["is_anomaly"] is True and out[8]["z"] > 10
    # quiet day inside the run is not anomalous
    assert out[7]["is_anomaly"] is False


def test_dedup_against_corpus_disposition(spark):
    from lakehouse_spark_spark.operators.dedup import dedup_against_corpus

    batch = spark.createDataFrame(
        [(10, "hello world"), (11, "Hello   WORLD"), (12, "fresh text")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame([(1, "hello world"), (2, "other")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup_against_corpus(batch, corpus, "doc_id", "text").collect()}
    # 10 and 11 normalize to the same content already present in corpus
    assert out[10]["dup_of_corpus"] and out[11]["dup_of_corpus"]
    assert not out[10]["dup_in_batch"] and out[11]["dup_in_batch"]
    assert not out[10]["keep"] and not out[11]["keep"]
    # 12 is new and unique -> keep
    assert out[12]["keep"] and not out[12]["dup_of_corpus"] and not out[12]["dup_in_batch"]
