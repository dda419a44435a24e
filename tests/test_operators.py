"""Unit tests for the core operator library on tiny literal DataFrames
(SURVEY.md §5 test plan: unit tests per operator)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_spark_spark.operators.cleaning import null_to_sentinel, recompute_money, typed_cast
from lakehouse_spark_spark.operators.dedup import dedup_latest, exact_dedup
from lakehouse_spark_spark.operators.dimensions import build_dim_date, build_dimension
from lakehouse_spark_spark.operators.dq import DQCheck, duplicate_rate, null_rate, orphan_rate_df, run_checks
from lakehouse_spark_spark.operators.facts import fk_stamp, orphan_audit, orphan_drop


def test_dedup_latest_keeps_max_and_breaks_ties(spark):
    df = spark.createDataFrame(
        [
            ("a", "2024-01-01", 1),
            ("a", "2024-02-01", 2),  # winner: latest ts
            ("b", "2024-01-01", 3),
            ("b", "2024-01-01", 4),  # tie on ts -> tiebreak id desc
        ],
        ["k", "ts", "id"],
    )
    out = {r["k"]: r["id"] for r in dedup_latest(df, "k", "ts", tiebreak="id").collect()}
    assert out == {"a": 2, "b": 4}


def test_dedup_latest_property_one_row_per_key(spark):
    rows = [(i % 7, f"2024-01-{(i % 28) + 1:02d}", i) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "ts", "id"])
    out = dedup_latest(df, "k", "ts", tiebreak="id")
    assert out.count() == 7
    assert out.select("k").distinct().count() == 7


def test_exact_dedup_keep_min(spark):
    df = spark.createDataFrame([("x", 5), ("x", 2), ("y", 9)], ["t", "doc_id"])
    out = {r["t"]: r["doc_id"] for r in exact_dedup(df, "t", keep_min="doc_id").collect()}
    assert out == {"x": 2, "y": 9}


def test_exact_dedup_tiebreak_pins_representative(spark):
    # keep_min ties within the group: the tiebreak column must pick the
    # survivor deterministically regardless of partition order
    rows = [("x", 1, "b"), ("x", 1, "a"), ("x", 2, "z"), ("y", 1, "q")]
    df = spark.createDataFrame(rows, ["t", "rank", "src"]).repartition(8)
    out = {(r["t"]): (r["rank"], r["src"]) for r in exact_dedup(df, "t", keep_min="rank", tiebreak="src").collect()}
    assert out == {"x": (1, "a"), "y": (1, "q")}
    again = {(r["t"]): (r["rank"], r["src"]) for r in exact_dedup(df, "t", keep_min="rank", tiebreak="src").collect()}
    assert again == out


def test_typed_cast_policies(spark):
    df = spark.createDataFrame([("1",), ("oops",), (None,)], ["v"])
    kept = typed_cast(df, "v", "int", "keep")
    assert [r["v"] for r in kept.collect()] == [1, None, None]
    dropped = typed_cast(df, "v", "int", "drop")
    assert [r["v"] for r in dropped.collect()] == [1]
    # default policy: only literal nulls take the default ('oops' is
    # non-null, coalesce keeps it, then the cast fails -> null).
    dflt = typed_cast(df, "v", "decimal(10,2)", "default", default=0)
    vals = sorted((str(r["v"]) if r["v"] is not None else "NULL") for r in dflt.collect())
    assert vals == ["0.00", "1.00", "NULL"]


def test_recompute_money_decimal(spark):
    df = spark.createDataFrame([(3, "19.99")], ["q", "p"])
    df = typed_cast(df, "p", "decimal(10,2)")
    out = recompute_money(df, "total", "q", "p").collect()[0]["total"]
    assert str(out) == "59.97"


def test_null_to_sentinel(spark):
    df = spark.createDataFrame([(None,), ("C1",)], ["cid"])
    out = sorted(r["cid"] for r in null_to_sentinel(df, "cid", "-1").collect())
    assert out == ["-1", "C1"]


def test_fk_stamp_orphan_modes(spark):
    fact = spark.createDataFrame([(1, "a"), (99, "b"), (None, "c")], ["k", "v"])
    dim = spark.createDataFrame([(1,), (2,)], ["k"])
    # golden-parity mode: orphan 99 passes through, null -> -1
    actual = {r["v"]: r["k"] for r in fk_stamp(fact, dim, "k", sentinel=-1).collect()}
    assert actual == {"a": 1, "b": 99, "c": -1}
    # documented-intent mode: orphan also -> -1
    intent = {r["v"]: r["k"] for r in fk_stamp(fact, dim, "k", sentinel=-1, orphan_to_unknown=True).collect()}
    assert intent == {"a": 1, "b": -1, "c": -1}


def test_orphan_drop_and_audit(spark):
    fact = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "v"])
    parent = spark.createDataFrame([(1,), (1,), (2,)], ["k"])
    assert [r["v"] for r in orphan_drop(fact, parent, "k").collect()] == ["a"]
    assert [r["v"] for r in orphan_audit(fact, parent, "k").collect()] == ["b"]


def test_build_dimension_unknown_member(spark):
    df = spark.createDataFrame(
        [(1, "n1", "2024-01-01"), (1, "n1b", "2024-02-01"), (2, "n2", "2024-01-01")],
        ["id", "name", "created_at"],
    )
    dim = build_dimension(df, "id", "created_at", ["id", "name"], unknown_row={"id": -1, "name": "UNKNOWN"})
    got = {r["id"]: r["name"] for r in dim.collect()}
    assert got == {1: "n1b", 2: "n2", -1: "UNKNOWN"}


def test_build_dim_date(spark):
    a = spark.createDataFrame([("2024-01-06",), ("2024-01-06",), (None,)], ["d"])  # a Saturday
    b = spark.createDataFrame([("2024-01-08",)], ["d"])  # a Monday
    dd = {r["date_id"]: r for r in build_dim_date([(a, "d"), (b, "d")]).collect()}
    assert set(dd) == {20240106, 20240108}
    assert dd[20240106]["is_weekend"] is True
    assert dd[20240106]["day_name"] == "Saturday"
    assert dd[20240108]["is_weekend"] is False
    assert dd[20240108]["month_name"] == "January"
    assert dd[20240108]["day_of_week"] == 2  # 1=Sunday convention


def test_dq_checks_single_job(spark):
    df = spark.createDataFrame([(1, None), (2, "x"), (2, "y"), (3, "z")], ["k", "v"])
    res = run_checks(
        df,
        [
            DQCheck("null_rate_v", "t", null_rate("v"), 0.30),
            DQCheck("dup_rate_k", "t", duplicate_rate("k"), 0.0),
        ],
    )
    rows = {r["check_name"]: r for r in res.collect()}
    assert rows["null_rate_v"]["metric_value"] == 0.25
    assert rows["null_rate_v"]["status"] == "PASS"
    assert rows["dup_rate_k"]["metric_value"] == 0.25
    assert rows["dup_rate_k"]["status"] == "FAIL"


def test_orphan_rate_df(spark):
    fact = spark.createDataFrame([(1,), (1,), (99,), (98,)], ["fk"])
    parent = spark.createDataFrame([(1,), (2,)], ["pk"])
    row = orphan_rate_df(fact, parent, "fk", "orph", "fact", 0.0, parent_key="pk").collect()[0]
    assert row["metric_value"] == 0.5
    assert row["status"] == "FAIL"
