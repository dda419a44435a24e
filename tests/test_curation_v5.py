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

    # --- text ↔ count agreement (r9 ADVICE): tokenizing the SHIPPED
    # text reproduces the n_tokens the budget/accounting charged —
    # i.e. the payload is the span-trimmed document, so a loader can
    # never overflow a non-overflow bin
    from lakehouse_spark_spark.operators.text import tokens as _toks

    mismatch = shards.filter(
        F.size(_toks("text")) - F.when(F.col("text") == "", 1).otherwise(0)
        != F.col("n_tokens")
    ).count()
    assert mismatch == 0
    # (this fixture has no span-trimmed doc surviving to kept_train;
    # test_v5_ship_ships_trimmed_text plants some so the trim path is
    # exercised non-vacuously)

    # --- fill_ratio is a true non-overflow packing efficiency: in
    # (0, 1], never inflated by overflow singletons (NULL when a shard
    # is all-overflow)
    for r in rows:
        if r["fill_ratio"] is not None:
            assert 0.0 < r["fill_ratio"] <= 1.0
        else:
            assert r["n_overflow"] == r["n_sequences"]


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


def test_v5_ship_ships_trimmed_text(spark, tmp_path):
    """The r9 ADVICE bug, exercised non-vacuously: docs carrying a
    corpus-duplicated 8+-gram span that SURVIVE to kept_train must ship
    with that span excised — the shipped text tokenizes to exactly the
    kept_tokens the budget/accounting charged, never the raw count.
    The fixture corpus has no such survivor, so boilerplate-bearing
    docs are planted: six distinct doc prefixes sharing one 12-word
    boilerplate tail (enough occurrences for min_count=2, prefixes
    distinct enough to clear exact/near dedup)."""
    from lakehouse_spark_spark.operators.text import tokens as _toks
    from lakehouse_spark_spark.plans.corpus import curation_v3_docs, curation_v5_ship

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    base = docs.filter("lang = 'en'").orderBy("doc_id").limit(6).collect()
    assert len(base) == 6
    boiler = "subscribe to our newsletter today and follow the channel for weekly updates"
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    # choose ids that deterministically land in kept_train: the split
    # is substr(md5(id),1,4) < 'e666' and the per-source budget admits
    # docs in md5-rank order, so a LOW md5 prefix pins both; skip the
    # %97 eval-holdout residues. Scanning upward from max_id+1 keeps
    # the choice stable for a fixed fixture.
    import hashlib

    pids, pid = [], max_id + 1
    while len(pids) < len(base):
        if pid % 97 != 0 and hashlib.md5(str(pid).encode()).hexdigest()[:4] < "4000":
            pids.append(pid)
        pid += 1
    planted_rows = []
    for i, r in enumerate(base):
        words = r["text"].split(" ")
        prefix = " ".join(words[: max(20, int(len(words) * 0.6))])
        planted_rows.append((pids[i], f"{prefix} {boiler}", r["lang"], r["source"], 0))
    planted = spark.createDataFrame(
        planted_rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    aug = docs.unionByName(planted)
    disp = curation_v3_docs(aug).localCheckpoint(eager=False)
    pids = [p[0] for p in planted_rows]
    pd_rows = {r["doc_id"]: r for r in disp.filter(F.col("doc_id").isin(pids)).collect()}
    # the planted docs reached the span stage and were genuinely trimmed
    surv = [r for r in pd_rows.values() if r["kept_tokens"] is not None]
    assert len(surv) >= 2
    assert all(r["kept_tokens"] < r["n_tokens"] for r in surv)
    shipped_pids = [r["doc_id"] for r in surv if r["disposition"] == "kept_train"]
    assert shipped_pids, "expected >=1 planted doc in kept_train"

    out = str(tmp_path / "trim_ship")
    curation_v5_ship(aug, out, seq_budget=BUDGET, disposition=disp)
    shards = spark.read.parquet(f"{out}/shards")
    got = {r["doc_id"]: r for r in shards.filter(F.col("doc_id").isin(shipped_pids)).collect()}
    assert set(got) == set(shipped_pids)
    for pid in shipped_pids:
        row = got[pid]
        # the boilerplate span is gone from the payload...
        assert boiler not in row["text"]
        # ...and the payload tokenizes to exactly the charged count
        n = len(row["text"].split(" ")) if row["text"] else 0
        assert n == row["n_tokens"] == pd_rows[pid]["kept_tokens"]
    # global text↔count agreement over the whole augmented ship
    assert (
        shards.filter(
            F.size(_toks("text")) - F.when(F.col("text") == "", 1).otherwise(0)
            != F.col("n_tokens")
        ).count()
        == 0
    )
