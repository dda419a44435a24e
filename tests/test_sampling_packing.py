"""Deterministic splits/samples (operators/sampling.py) and sequence
packing (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_spark_spark.operators.packing import pack_sequences, packing_stats
from lakehouse_spark_spark.operators.sampling import hash_split, split_thresholds, stratified_sample


def test_split_thresholds_cover_space():
    pairs = split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05})
    assert [n for n, _ in pairs] == ["train", "val", "test"]
    assert pairs[0][1] == "e666"  # 0.9 * 65536 = 58982 = 0xE666
    assert pairs[1][1] == "f333"


def test_hash_split_stable_and_weighted(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    split = hash_split(df, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.9) < 0.03
    # appending rows must not move existing assignments
    bigger = hash_split(
        spark.range(0, 6000).withColumnRenamed("id", "doc_id"), "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    a = {r["doc_id"]: r["split"] for r in split.collect()}
    b = {r["doc_id"]: r["split"] for r in bigger.filter("doc_id < 5000").collect()}
    assert a == b


def test_stratified_sample_deterministic(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    s1 = {(r["doc_id"], r["lang"]) for r in stratified_sample(df, "lang", "doc_id", 10).collect()}
    s2 = {(r["doc_id"], r["lang"]) for r in stratified_sample(df.repartition(7), "lang", "doc_id", 10).collect()}
    assert s1 == s2
    assert sum(1 for _, lang in s1 if lang == "en") == 10
    assert sum(1 for _, lang in s1 if lang == "de") == 10


def test_pack_sequences_layout(spark):
    # one shard, budget 10: docs of 4,4,4 tokens -> third doc straddles 8..11
    rows = [(1, "s", 4), (2, "s", 4), (3, "s", 4), (4, "s", 10)]
    df = spark.createDataFrame(rows, ["doc_id", "shard_in", "n_tokens"])
    got = {
        r["doc_id"]: (r["start_offset"], r["seq_id"], r["straddles"])
        for r in pack_sequences(df, "doc_id", "n_tokens", 10, "shard_in").collect()
    }
    assert got[1] == (0, 0, False)
    assert got[2] == (4, 0, False)
    assert got[3] == (8, 0, True)  # spans tokens 8..11 across the seq-0/1 cut
    assert got[4] == (12, 1, True)  # 12..21 crosses the seq-1/2 cut at 20

    stats = packing_stats(pack_sequences(df, "doc_id", "n_tokens", 10, "shard_in"), 10).collect()[0]
    assert stats["n_sequences"] == 2  # seqs 0 and 1 started
    assert stats["total_tokens"] == 22


def test_pack_sequences_shards_independent(spark):
    rows = [(1, "a", 5), (2, "b", 5), (3, "a", 5), (4, "b", 5)]
    df = spark.createDataFrame(rows, ["doc_id", "sh", "n_tokens"])
    got = {r["doc_id"]: r["start_offset"] for r in pack_sequences(df, "doc_id", "n_tokens", 100, "sh").collect()}
    assert got == {1: 0, 2: 0, 3: 5, 4: 5}


def test_weighted_sample_deterministic_and_biased(spark):
    """A-ES sample: reproducible, exactly n per stratum, and weight
    actually biases inclusion (heavy rows overrepresented vs uniform)."""
    from pyspark.sql import functions as F

    from lakehouse_spark_spark.operators.sampling import weighted_sample

    # weights 1 vs 100 in one stratum of 200 rows; sample 50
    df = spark.range(200).select(
        F.col("id"),
        F.lit("s").alias("g"),
        F.when(F.col("id") < 100, 1.0).otherwise(100.0).alias("w"),
    )
    s1 = weighted_sample(df, "id", "w", n=50, strata=["g"])
    s2 = weighted_sample(df, "id", "w", n=50, strata=["g"])
    ids1 = {r["id"] for r in s1.collect()}
    ids2 = {r["id"] for r in s2.collect()}
    assert ids1 == ids2 and len(ids1) == 50
    heavy = sum(1 for i in ids1 if i >= 100)
    assert heavy > 40  # weight-100 rows dominate the sample

    # multi-strata: exactly n from each
    df2 = spark.range(100).select(F.col("id"), (F.col("id") % 3).alias("g"), F.lit(1.0).alias("w"))
    out = weighted_sample(df2, "id", "w", n=10, strata=["g"])
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {0: 10, 1: 10, 2: 10}
