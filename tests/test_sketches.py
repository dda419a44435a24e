"""Mergeable-sketch operators: HLL tier algebra and heavy hitters."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_hll_rollup_equals_direct_sketch(spark):
    """Union-of-daily-sketches must EQUAL the direct monthly sketch —
    not approximately: HLL state is a per-bucket max over hashed
    values, so merge order/grouping cannot change it."""
    from lakehouse_spark_spark.operators.sketches import rollup_sketches, sketch_tier
    from lakehouse_spark_spark.sources.loaders import load_table

    ev = load_table(spark, SF_SMALL, "events")
    daily = sketch_tier(ev, "ts", "user_id", grain="day")
    rolled = {r["bucket"]: r["approx_distinct"] for r in rollup_sketches(daily, "month").collect()}

    direct_tier = sketch_tier(ev, "ts", "user_id", grain="month")
    from lakehouse_spark_spark.operators.sketches import estimate_tier

    direct = {r["bucket"]: r["approx_distinct"] for r in estimate_tier(direct_tier).collect()}
    assert rolled == direct and len(rolled) > 0


def test_hll_estimate_close_to_exact(spark):
    from lakehouse_spark_spark.operators.sketches import rollup_sketches, sketch_tier
    from lakehouse_spark_spark.sources.loaders import load_table

    ev = load_table(spark, SF_SMALL, "events")
    tier = sketch_tier(ev, "ts", "user_id", grain="day")
    est = {r["bucket"]: r["approx_distinct"] for r in rollup_sketches(tier, "month").collect()}
    exact = {
        r["bucket"]: r["n"]
        for r in ev.groupBy(F.date_trunc("month", "ts").alias("bucket"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for b, e in est.items():
        assert abs(e - exact[b]) / exact[b] < 0.05, (b, e, exact[b])


def test_hll_rollup_counts_exact(spark):
    """n_rows flows through the tier exactly (plain sums)."""
    from lakehouse_spark_spark.operators.sketches import rollup_sketches, sketch_tier
    from lakehouse_spark_spark.sources.loaders import load_table

    ev = load_table(spark, SF_SMALL, "events")
    tier = sketch_tier(ev, "ts", "user_id", grain="day")
    total = rollup_sketches(tier, "year").agg(F.sum("n_rows")).collect()[0][0]
    assert total == ev.count()


def test_heavy_hitters_exact_when_cardinality_fits(spark):
    from lakehouse_spark_spark.operators.sketches import heavy_hitters
    from lakehouse_spark_spark.sources.loaders import load_table

    ev = load_table(spark, SF_SMALL, "events")
    got = {(r["item"], r["est_count"]) for r in heavy_hitters(ev, "event_type", k=5).collect()}
    want = {
        (r["event_type"], r["n"])
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_heavy_hitters_rank_ordered(spark):
    from lakehouse_spark_spark.operators.sketches import heavy_hitters
    from lakehouse_spark_spark.sources.loaders import load_table

    ev = load_table(spark, SF_SMALL, "events")
    rows = heavy_hitters(ev, "event_type", k=3).orderBy("rank").collect()
    assert len(rows) == 3
    counts = [r["est_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_rolling_sketch_reach_close_to_exact(spark):
    """Windowed hll_union_agg over the daily tier tracks the exact
    rolling 7-day distinct count within sketch error."""
    from pyspark.sql import Window

    from lakehouse_spark_spark.operators.sketches import sketch_tier
    from lakehouse_spark_spark.sources.loaders import load_table

    ev = load_table(spark, SF_SMALL, "events")
    tier = sketch_tier(ev, "ts", "user_id", grain="day")
    tier.createOrReplaceTempView("__t")
    est = {
        r["bucket"]: r["reach"]
        for r in spark.sql(
            """SELECT bucket, CAST(hll_sketch_estimate(hll_union_agg(sketch) OVER
               (ORDER BY bucket ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS LONG) AS reach
               FROM __t"""
        ).collect()
    }
    days = ev.select(F.date_trunc("day", "ts").alias("d"), "user_id").distinct()
    a, b = days.alias("a"), days.alias("b")
    exact = {
        r["d"]: r["n"]
        for r in a.join(
            b,
            (F.col("b.d") <= F.col("a.d"))
            & (F.col("b.d") >= F.col("a.d") - F.expr("INTERVAL 6 DAYS")),
        )
        .groupBy(F.col("a.d").alias("d"))
        .agg(F.count_distinct("b.user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact) and len(est) > 3
    for d, e in est.items():
        assert abs(e - exact[d]) / exact[d] < 0.05, (d, e, exact[d])


def test_theta_overlap_exact_below_capacity(spark):
    """In exact mode (distinct < 2^lg_k) the theta set algebra —
    including INTERSECTION, which HLL cannot express — reproduces the
    exact member-level overlap numbers."""
    from lakehouse_spark_spark.operators.sketches import audience_overlap, theta_tier
    from lakehouse_spark_spark.sources.loaders import load_table

    ev = load_table(spark, SF_SMALL, "events")
    got = {
        (r["key_a"], r["key_b"]): (r["n_a"], r["n_b"], r["n_union"], r["n_intersect"], r["n_only_a"])
        for r in audience_overlap(theta_tier(ev, "event_type", "user_id"), "event_type").collect()
    }
    members = {
        r["event_type"]: set()
        for r in ev.select("event_type").distinct().collect()
    }
    for r in ev.select("event_type", "user_id").distinct().collect():
        members[r["event_type"]].add(r["user_id"])
    keys = sorted(members)
    want = {}
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            A, B = members[a], members[b]
            if A & B:
                want[(a, b)] = (len(A), len(B), len(A | B), len(A & B), len(A - B))
    assert got == want and len(got) > 0


class TestHistogramTier:
    def test_rollup_equals_direct_histogram(self, spark):
        from lakehouse_spark_spark.operators.sketches import histogram_tier
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(f"2001-01-{d:02d}", float(v)) for d in (1, 15, 28) for v in range(0, 1000, 7)],
            "day string, v double",
        ).select(F.col("day").cast("date").alias("day"), "v")
        tier = histogram_tier(df, "day", "v", lo=0.0, width=100.0, n_bins=10)
        monthly_from_tier = (
            tier.groupBy("bin").agg(F.sum("n").alias("n")).orderBy("bin").collect()
        )
        direct = (
            df.groupBy(F.floor(F.col("v") / 100).cast("long").alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("bin")
            .collect()
        )
        assert [(r["bin"], r["n"]) for r in monthly_from_tier] == [(r["bin"], r["n"]) for r in direct]

    def test_quantile_within_one_bin_of_exact(self, spark):
        from lakehouse_spark_spark.operators.sketches import histogram_tier, quantiles_from_tier
        from pyspark.sql import functions as F

        vals = [float(v) for v in range(1, 1001)]  # uniform 1..1000
        df = spark.createDataFrame([("2001-03-05", v) for v in vals], "day string, v double").select(
            F.col("day").cast("date").alias("day"), "v"
        )
        tier = histogram_tier(df, "day", "v", lo=0.0, width=50.0, n_bins=20)
        out = quantiles_from_tier(tier, "month", [0.5, 0.9], lo=0.0, width=50.0).collect()[0]
        import numpy as np

        assert out["n_rows"] == 1000
        assert abs(out["q_0_5"] - float(np.percentile(vals, 50))) <= 50.0
        assert abs(out["q_0_9"] - float(np.percentile(vals, 90))) <= 50.0

    def test_out_of_grid_values_clamp(self, spark):
        from lakehouse_spark_spark.operators.sketches import histogram_tier
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("2001-01-01", -5.0), ("2001-01-01", 1e9)], "day string, v double"
        ).select(F.col("day").cast("date").alias("day"), "v")
        rows = {r["bin"]: r["n"] for r in histogram_tier(df, "day", "v", 0.0, 10.0, 4).collect()}
        assert rows == {0: 1, 3: 1}


def test_rolling_union_halo_equals_global_window(spark):
    """The halo-partition rolling union (round 4) is row-identical to
    the single-partition global-window form it replaced."""
    from lakehouse_spark_spark.operators.sketches import rolling_union_from_tier, sketch_tier
    from lakehouse_spark_spark.sources.loaders import load_table

    ev = load_table(spark, SF_SMALL, "events")
    tier = sketch_tier(ev, "ts", "user_id", grain="day").localCheckpoint()
    tier.createOrReplaceTempView("__t_halo")
    want = {
        r["day_us"]: (r["reach_7d"], r["events_7d"])
        for r in spark.sql(
            """SELECT unix_micros(bucket) AS day_us,
                      CAST(hll_sketch_estimate(hll_union_agg(sketch) OVER w) AS LONG) AS reach_7d,
                      SUM(n_rows) OVER w AS events_7d
               FROM __t_halo
               WINDOW w AS (ORDER BY bucket ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"""
        ).collect()
    }
    got = {
        r["day_us"]: (r["reach_7d"], r["events_7d"])
        for r in rolling_union_from_tier(tier, preceding=6).collect()
    }
    assert got == want
    assert len(got) > 7


def test_rolling_union_halo_sparse_years(spark):
    """ADVICE r4 (medium): a calendar year with FEWER than `preceding`
    tier rows — or an entirely empty year — must still produce complete
    frames at the start of the next year. The r5 halo build pulls
    predecessors by global row index, not "previous year's tail", so
    frames cascade across sparse/empty year gaps."""
    from pyspark.sql import functions as F

    from lakehouse_spark_spark.operators.sketches import rolling_union_from_tier, sketch_tier

    # 2019: dense Dec tail; 2020: ONE row (sparse, < preceding=6);
    # 2021: empty; 2022: rows whose 7-row frames must reach back through
    # 2020 into 2019.
    days = (
        [f"2019-12-{d:02d}" for d in range(20, 32)]
        + ["2020-06-15"]
        + [f"2022-01-{d:02d}" for d in range(1, 6)]
    )
    rows = [(d, uid) for i, d in enumerate(days) for uid in range(i * 3, i * 3 + 5)]
    df = spark.createDataFrame(rows, "d string, user_id long").select(
        F.to_timestamp("d").alias("ts"), "user_id"
    )
    tier = sketch_tier(df, "ts", "user_id", grain="day").localCheckpoint()
    tier.createOrReplaceTempView("__t_halo_sparse")
    want = {
        r["day_us"]: (r["reach_7d"], r["events_7d"])
        for r in spark.sql(
            """SELECT unix_micros(bucket) AS day_us,
                      CAST(hll_sketch_estimate(hll_union_agg(sketch) OVER w) AS LONG) AS reach_7d,
                      SUM(n_rows) OVER w AS events_7d
               FROM __t_halo_sparse
               WINDOW w AS (ORDER BY bucket ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"""
        ).collect()
    }
    got = {
        r["day_us"]: (r["reach_7d"], r["events_7d"])
        for r in rolling_union_from_tier(tier, preceding=6).collect()
    }
    assert got == want
    assert len(got) == len(days)


def test_rolling_union_rejects_preceding_below_one(spark):
    """Round-7 pin of the r6 guard: preceding=0 would make the halo
    fan-out sequence DESCEND (Spark counts down when stop < start) and
    emit spurious halo rows — the guard must raise before any plan is
    built."""
    import pytest

    from lakehouse_spark_spark.operators.sketches import rolling_union_from_tier

    tier = spark.range(1).select(F.col("id").alias("bucket"))
    with pytest.raises(ValueError, match="preceding"):
        rolling_union_from_tier(tier, preceding=0)
