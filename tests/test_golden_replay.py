"""Golden-output replay: run the medallion pipeline on the reference's
own dirty CSVs and assert the reference's published results
(SURVEY.md §5 test plan item 2; FIXTURES.md §A.4)."""

from __future__ import annotations

import datetime
import uuid

import pytest

DATA = "/root/reference/data"


@pytest.fixture(scope="module")
def result(spark):
    from lakehouse_spark_spark.plans.pipeline import run_pipeline

    return run_pipeline(spark, DATA)


def test_golden_row_counts(result):
    assert result.row_counts == {
        "dim_customer": 81,
        "fact_work_order": 397,
        "fact_parts_sales": 923,
        "dim_date": 355,
    }


def test_dq_all_pass_at_zero(result):
    rows = {r["check_name"]: r for r in result.dq_results.collect()}
    assert set(rows) == {"null_rate_customer_id", "duplicate_rate_work_order", "orphan_rate_parts_sales"}
    for r in rows.values():
        assert r["status"] == "PASS"
        assert r["metric_value"] == 0.0


def test_orphan_customer_ids_pass_through(result):
    """The reference's ACTUAL J1 behavior: orphan ids like C9008 survive
    into fact_work_order (SURVEY.md §2.3), only literal nulls -> -1."""
    ids = {r["customer_id"] for r in result.fact_work_order.select("customer_id").distinct().collect()}
    assert any(i.startswith("C90") for i in ids)
    assert "-1" in ids


def test_intent_mode_maps_orphans_to_unknown(spark):
    from lakehouse_spark_spark.plans.pipeline import run_pipeline

    res = run_pipeline(spark, DATA, orphan_to_unknown=True)
    ids = {r["customer_id"] for r in res.fact_work_order.select("customer_id").distinct().collect()}
    assert not any(i.startswith("C90") for i in ids)
    assert "-1" in ids


def test_idempotence_rerun_identical(spark, result):
    """README_CANDIDATO.md:24 run-twice-no-dup contract."""
    from lakehouse_spark_spark.plans.pipeline import run_pipeline

    again = run_pipeline(spark, DATA)
    assert again.row_counts == result.row_counts


def test_run_log(spark, result):
    from lakehouse_spark_spark.plans.pipeline import run_log

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    t1 = t0 + datetime.timedelta(seconds=5)
    row = run_log(spark, result, str(uuid.uuid4()), t0, t1).collect()[0]
    assert row["duration_seconds"] == 5.0
    assert row["rows_dim_customer"] == 81
