"""Regression tests for the round-3 ADVICE items."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestMergePartialsMinMax:
    def test_min_max_merge_fns(self, spark):
        from lakehouse_spark_spark.operators.incremental import merge_partials

        a = spark.createDataFrame([(1, 10, 5, 100)], "k INT, s INT, mn INT, mx INT")
        b = spark.createDataFrame([(1, 7, 3, 50)], "k INT, s INT, mn INT, mx INT")
        out = merge_partials(a, b, ["k"], merge_fns={"mn": "min", "mx": "max"}).collect()[0]
        assert (out["s"], out["mn"], out["mx"]) == (17, 3, 100)

    def test_default_still_sums(self, spark):
        from lakehouse_spark_spark.operators.incremental import merge_partials

        a = spark.createDataFrame([(1, 10)], "k INT, s INT")
        b = spark.createDataFrame([(1, 7)], "k INT, s INT")
        assert merge_partials(a, b, ["k"]).collect()[0]["s"] == 17

    def test_bad_merge_fn_raises(self, spark):
        from lakehouse_spark_spark.operators.incremental import merge_partials

        a = spark.createDataFrame([(1, 10)], "k INT, s INT")
        with pytest.raises(ValueError):
            merge_partials(a, a, ["k"], merge_fns={"s": "avg"})
        with pytest.raises(ValueError):
            merge_partials(a, a, ["k"], merge_fns={"nope": "sum"})


class TestHistogramTierNulls:
    def test_null_values_dropped(self, spark):
        from lakehouse_spark_spark.operators.sketches import histogram_tier, quantiles_from_tier

        df = spark.createDataFrame(
            [("2024-01-01", 1.0), ("2024-01-01", None), ("2024-01-01", 9.0)],
            "day STRING, v DOUBLE",
        ).select(F.col("day").cast("date").alias("day"), "v")
        tier = histogram_tier(df, "day", "v", lo=0.0, width=1.0, n_bins=10)
        rows = tier.collect()
        assert sum(r["n"] for r in rows) == 2  # the NULL row never enters a bin
        q = quantiles_from_tier(tier, "day", [0.5], lo=0.0, width=1.0).collect()[0]
        assert q["n_rows"] == 2


class TestBlocklistNormalization:
    def test_mixed_case_and_multispace_entries_match(self, spark):
        from lakehouse_spark_spark.operators.text import blocklist_flags

        df = spark.createDataFrame(
            [(1, "this has a BadWord inside"), (2, "two word  phrase here"), (3, "clean")],
            "id LONG, text STRING",
        )
        out = {
            r["id"]: (r["blocked"], r["n_blocked_terms"], r["has_blocked_phrase"])
            for r in blocklist_flags(
                df, "id", "text", ["BADWORD"], ["Two   Word Phrase"]
            ).collect()
        }
        assert out[1][0] and out[1][1] == 1
        assert out[2][0] and out[2][2]
        assert not out[3][0]


class TestPackingNativeIdType:
    def test_string_ids_survive(self, spark):
        from lakehouse_spark_spark.operators.packing import pack_bins_bfd

        df = spark.createDataFrame(
            [("doc-a", "s1", 60), ("doc-b", "s1", 50), ("doc-c", "s1", 40)],
            "doc_id STRING, shard STRING, toks LONG",
        )
        rows = pack_bins_bfd(df, "doc_id", "toks", budget=100, shard_col="shard").collect()
        by_id = {r["doc_id"]: r for r in rows}
        assert set(by_id) == {"doc-a", "doc-b", "doc-c"}  # no NULL-collapsed ids
        # BFD: 60+40 fit one bin, 50 in another; capacity never exceeded
        fills = {}
        for r in rows:
            fills.setdefault(r["bin_id"], 0)
            fills[r["bin_id"]] += r["n_tokens"]
            assert not r["overflow"]
        assert all(f <= 100 for f in fills.values())
        assert len(fills) == 2


class TestGopherEdgeCases:
    def test_empty_and_symbol_heavy_docs(self, spark):
        from lakehouse_spark_spark.operators.text import gopher_quality_flags

        df = spark.createDataFrame(
            [
                (1, ""),                               # empty text
                (2, "### ### ### ###"),                # symbols only
                (3, "the be to of and that have with " + "word " * 50),  # passes all
                (4, "a " * 60),                        # words too short, few stopwords
            ],
            "doc_id LONG, text STRING",
        )
        out = {r["doc_id"]: r for r in gopher_quality_flags(df, "doc_id", "text").collect()}
        assert out[1]["keep"] is False and out[1]["word_count_ok"] is False
        assert out[2]["keep"] is False and out[2]["symbol_ratio_ok"] is False
        assert out[3]["keep"] is True
        assert out[4]["keep"] is False and out[4]["mean_word_len_ok"] is False

    def test_ellipsis_counting(self, spark):
        from lakehouse_spark_spark.operators.text import gopher_quality_flags

        df = spark.createDataFrame([(1, "word ... more ... text")], "doc_id LONG, text STRING")
        r = gopher_quality_flags(df, "doc_id", "text").collect()[0]
        assert r["n_symbols"] == 2


class TestGopherLineRules:
    def test_bullet_and_ellipsis_line_fractions(self, spark):
        from lakehouse_spark_spark.operators.text import gopher_line_flags

        docs = [
            # 10 lines, all bullets -> bullet fraction 100% > 90% -> drop
            (1, "\n".join(f"- item {i}" for i in range(10))),
            # 10 lines, 9 bullets -> exactly 90% -> keep (rule is >90%)
            (2, "\n".join([f"- item {i}" for i in range(9)] + ["plain line"])),
            # 10 lines, 4 ellipsis-ended -> 40% > 30% -> drop
            (3, "\n".join([f"line {i}..." for i in range(4)] + [f"line {i}" for i in range(6)])),
            # 10 lines, 3 ellipsis-ended -> exactly 30% -> keep
            (4, "\n".join([f"line {i}..." for i in range(3)] + [f"line {i}" for i in range(7)])),
            # blank lines are dropped before counting; unicode forms count
            (5, "• bullet\n\n  \nends…\nplain"),
            # hyphenated word is NOT a bullet ("- " needs the space)
            (6, "-notbullet\nplain"),
            # empty text: zero lines passes both rules
            (7, ""),
        ]
        df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
        out = {r["doc_id"]: r for r in gopher_line_flags(df, "doc_id", "text").collect()}
        assert out[1]["keep"] is False and out[1]["bullet_ok"] is False
        assert out[2]["keep"] is True and out[2]["n_bullet_lines"] == 9
        assert out[3]["keep"] is False and out[3]["ellipsis_ok"] is False
        assert out[4]["keep"] is True and out[4]["n_ellipsis_lines"] == 3
        assert out[5]["n_lines"] == 3
        assert out[5]["n_bullet_lines"] == 1 and out[5]["n_ellipsis_lines"] == 1
        assert out[6]["n_bullet_lines"] == 0
        assert out[7]["n_lines"] == 0 and out[7]["keep"] is True
