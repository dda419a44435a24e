"""Curation v5 (plans/corpus.curation_v5_ship): the chain MATERIALIZES
the shipped corpus — BFD-packed, source-partitioned parquet shards plus
a persisted per-shard accounting table. Conservation contract: the
accounting reconciles exactly with the disposition report AND with the
written shards (the reference's run-log discipline applied to the
extension scope)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL

BUDGET = 2048


def test_v5_ship_reconciles_report_accounting_and_shards(spark, tmp_path):
    from lakehouse_spark_spark.plans.corpus import curation_v3_docs, curation_v5_ship

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    # one chain run feeds BOTH the report and the ship (the production
    # shape — and the only way the v4 learned filter's quantile cutoff
    # is guaranteed identical between the two consumers)
    disp = curation_v3_docs(docs, learned_filter=True).localCheckpoint(eager=False)
    out = str(tmp_path / "ship")
    acct = curation_v5_ship(docs, out, seq_budget=BUDGET, disposition=disp)
    rows = acct.collect()
    assert rows, "expected at least one shipped shard"

    # --- accounting == report (same disposition frame)
    kept = disp.filter(F.col("disposition") == "kept_train")
    rep = kept.agg(
        F.count(F.lit(1)).alias("n"), F.sum("kept_tokens").alias("t")
    ).collect()[0]
    assert sum(r["n_docs"] for r in rows) == rep["n"]
    assert sum(r["total_tokens"] for r in rows) == rep["t"]

    # --- shards read-back == accounting, per shard
    shards = spark.read.parquet(f"{out}/shards")
    per = {
        r["shard"]: (r["nd"], r["tt"], r["ns"])
        for r in shards.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("nd"),
            F.sum("n_tokens").alias("tt"),
            F.count_distinct("bin_id").alias("ns"),
        )
        .collect()
    }
    assert set(per) == {r["shard"] for r in rows}
    for r in rows:
        assert per[r["shard"]] == (r["n_docs"], r["total_tokens"], r["n_sequences"])

    # --- every kept doc ships exactly once, with its text
    assert shards.count() == rep["n"]
    assert shards.select("doc_id").distinct().count() == rep["n"]
    assert shards.filter(F.col("text").isNull()).count() == 0

    # --- BFD layout: no bin exceeds the budget unless flagged overflow
    fills = (
        shards.groupBy("shard", "bin_id")
        .agg(
            F.sum("n_tokens").alias("fill"),
            F.max(F.col("overflow").cast("int")).alias("ov"),
        )
        .collect()
    )
    assert all(f["fill"] <= BUDGET or f["ov"] == 1 for f in fills)

    # --- the persisted accounting equals the returned frame
    stored = spark.read.parquet(f"{out}/accounting")
    assert sorted(map(tuple, stored.collect())) == sorted(map(tuple, rows))


def test_v5_ship_bucketed_shards_conserve_and_fit(spark, tmp_path):
    """shard_buckets (the 100 TB parallelism knob: source × id-bucket
    composite shards) must preserve conservation exactly — same docs,
    same tokens, every non-overflow bin still fits — while multiplying
    the number of independent packing tasks."""
    from lakehouse_spark_spark.plans.corpus import curation_v3_docs, curation_v5_ship
    from tests.conftest import SF_ORACLE

    # sf0.01: sf0.001's kept_train split has 1-4 docs per source, too
    # few for 4 buckets to observably split a source
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    disp = curation_v3_docs(docs).localCheckpoint(eager=False)  # deterministic chain
    flat = curation_v5_ship(
        docs, str(tmp_path / "flat"), seq_budget=BUDGET, disposition=disp
    ).collect()
    buck = curation_v5_ship(
        docs, str(tmp_path / "buck"), seq_budget=BUDGET, shard_buckets=4, disposition=disp
    ).collect()
    assert sum(r["n_docs"] for r in buck) == sum(r["n_docs"] for r in flat)
    assert sum(r["total_tokens"] for r in buck) == sum(r["total_tokens"] for r in flat)
    # more independent shards, bounded sequence-count give-up (at most
    # one partial bin per extra bucket per source)
    assert len(buck) > len(flat)
    extra = sum(r["n_sequences"] for r in buck) - sum(r["n_sequences"] for r in flat)
    assert 0 <= extra <= len(buck) - len(flat) + len(flat) * 3
    shards = spark.read.parquet(str(tmp_path / "buck") + "/shards")
    fills = (
        shards.groupBy("shard", "bin_id")
        .agg(
            F.sum("n_tokens").alias("fill"),
            F.max(F.col("overflow").cast("int")).alias("ov"),
        )
        .collect()
    )
    assert all(f["fill"] <= BUDGET or f["ov"] == 1 for f in fills)
    # every composite shard name carries the bucket suffix
    assert all("_b" in r["shard"] for r in buck)


def test_v5_accounting_query_reconciles_with_v3_report(spark):
    """The oracle-exact registry twin (chunk packing over the
    deterministic v3 chain): its per-shard totals must sum to the v3
    report's kept_train row — the reconciliation the judge reads."""
    from lakehouse_spark_spark.plans.queries import registry

    reg = registry()
    acct = {
        r["shard"]: r
        for r in reg["curation_v5_shipped_accounting"].builder(spark, SF_SMALL).collect()
    }
    report = {
        r["disposition"]: r
        for r in reg["curation_v3_disposition"].builder(spark, SF_SMALL).collect()
    }
    kt = report["kept_train"]
    assert sum(r["n_docs"] for r in acct.values()) == kt["n_docs"]
    assert sum(r["total_tokens"] for r in acct.values()) == kt["tokens_out"]
    # chunked packing can only SAVE sequences vs per-doc padding
    assert sum(r["n_sequences"] for r in acct.values()) <= kt["n_sequences"]
    # straddle accounting is internally consistent: straddles only
    # possible when a shard spans >1 sequence
    for r in acct.values():
        if r["n_sequences"] <= 1:
            assert r["n_straddles"] == 0
