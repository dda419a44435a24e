"""Corpus-membership retraction (r15; the r14 verdict's lead item):
a takedown must reach the SHIPPED corpus and the streaming kept
ledgers, not just the persisted indexes. Covers the retraction stamp
(`shipped_retraction_view`), the compliance accounting split
(`shipped_retraction_accounting`), the physical shard rewrite
(`retract_from_shipped`), and the dual-owner curated kept ledger
(bloom keyed on content hash + near-dup keyed on doc id, one canonical
read filtering both)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from lakehouse_spark_spark.plans.corpus import (
    retract_from_shipped,
    shipped_retraction_accounting,
    shipped_retraction_view,
)


def _shipped(spark):
    rows = [
        # (doc_id, shard, n_tokens)
        (1, "s0", 100), (2, "s0", 50), (3, "s0", 30),
        (4, "s1", 200), (5, "s1", 10),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, shard string, n_tokens bigint")


def test_retraction_view_stamps_and_fast_path(spark):
    shipped = _shipped(spark)
    # no takedowns: constant-false stamp, no join in the plan
    plain = shipped_retraction_view(shipped, None)
    assert plain.filter("retracted").count() == 0
    assert "Join" not in plain._jdf.queryExecution().optimizedPlan().toString()

    retr = spark.createDataFrame([(2,), (4,)], "doc_id bigint")
    stamped = shipped_retraction_view(shipped, retr)
    got = {r["doc_id"]: r["retracted"] for r in stamped.collect()}
    assert got == {1: False, 2: True, 3: False, 4: True, 5: False}


def test_retraction_view_renames_foreign_id_column(spark):
    # tombstone ledgers carry their family's column name (__id etc.)
    shipped = _shipped(spark)
    retr = spark.createDataFrame([(3,)], "__id bigint")
    stamped = shipped_retraction_view(shipped, retr)
    assert stamped.filter("retracted").collect()[0]["doc_id"] == 3


def test_retraction_accounting_split(spark):
    shipped = _shipped(spark)
    retr = spark.createDataFrame([(2,), (4,)], "doc_id bigint")
    acct = {
        r["shard"]: r
        for r in shipped_retraction_accounting(shipped, retr).collect()
    }
    s0, s1 = acct["s0"], acct["s1"]
    # as-shipped totals keep their meaning (reconcile with the original
    # accounting) while the retracted/live split is the new dimension
    assert (s0["n_docs"], s0["total_tokens"]) == (3, 180)
    assert (s0["n_docs_retracted"], s0["tokens_retracted"], s0["tokens_live"]) == (1, 50, 130)
    assert (s1["n_docs"], s1["total_tokens"]) == (2, 210)
    assert (s1["n_docs_retracted"], s1["tokens_retracted"], s1["tokens_live"]) == (1, 200, 10)
    # conservation: retracted + live == total, per shard
    for r in acct.values():
        assert r["tokens_retracted"] + r["tokens_live"] == r["total_tokens"]


def test_retract_from_shipped_physical_rewrite(spark, tmp_path):
    out = str(tmp_path / "ship")
    _shipped(spark).write.mode("overwrite").partitionBy("shard").parquet(f"{out}/shards")
    retr = spark.createDataFrame([(1,), (5,)], "doc_id bigint")
    removed = retract_from_shipped(spark, out, retr)
    assert removed == 2
    left = spark.read.parquet(f"{out}/shards")
    assert sorted(r["doc_id"] for r in left.collect()) == [2, 3, 4]
    # shard partitioning preserved (partition dirs survive the rewrite)
    assert any(n.startswith("shard=") for n in os.listdir(f"{out}/shards"))
    # the accounting view is correct before AND after the purge: the
    # anti-join finds nothing left to mark
    acct = shipped_retraction_accounting(left, retr)
    assert acct.agg(F.sum("n_docs_retracted")).collect()[0][0] == 0


def test_curated_kept_ledger_dual_owner_retraction(spark, tmp_path):
    """The curated streaming loop's ledger is governed by TWO families
    with different key columns: a bloom takedown (content hash) and a
    near-dup takedown (doc id) must BOTH leave the canonical read, and
    purge_kept_ledger folds both exclusions into the rewrite."""
    from lakehouse_spark_spark.operators.bloom import (
        delete_from_dedup_index,
        write_dedup_index,
    )
    from lakehouse_spark_spark.operators.neardup import (
        delete_from_neardup_index,
        write_neardup_index,
    )
    from lakehouse_spark_spark.sources.sinks import (
        kept_ledger_owners,
        purge_kept_ledger,
        read_kept_ledger,
    )
    from lakehouse_spark_spark.streaming.ingest import curated_ingest_foreach_batch

    bpath = str(tmp_path / "bloom_idx")
    npath = str(tmp_path / "nd_idx")
    kept = str(tmp_path / "kept")
    seed = spark.createDataFrame(
        [(i, "seed document " + " ".join(f"s{i}w{j}" for j in range(25)))
         for i in range(8)],
        "doc_id bigint, text string",
    )
    write_dedup_index(seed, "text", bpath, m_bits=1 << 14, k=5)
    write_neardup_index(seed, "doc_id", "text", npath, n=3, num_hashes=32, bands=8)
    fn = curated_ingest_foreach_batch(
        bpath, "doc_id", "text", kept, min_words=5, max_words=1000,
        stopword_min=0, neardup_index_path=npath, neardup_threshold=0.95,
    )
    batch = spark.createDataFrame(
        [(100, "novel alpha " + " ".join(f"alpha{j:02d} words keep flowing" for j in range(8))),
         (101, "novel beta " + " ".join(f"betaa{j:02d} words keep flowing" for j in range(8))),
         (102, "novel gamma " + " ".join(f"gamma{j:02d} words keep flowing" for j in range(8)))],
        "doc_id bigint, text string",
    )
    fn(batch, 0)
    assert sorted(r["doc_id"] for r in read_kept_ledger(spark, kept).collect()) == [100, 101, 102]
    owners = kept_ledger_owners(kept)
    assert {o["index_path"] for o in owners} == {bpath, npath}

    # takedown doc 100 via the BLOOM family (content hash)...
    delete_from_dedup_index(
        bpath, batch.filter("doc_id = 100"), text_col="text"
    )
    # ...and doc 102 via the NEAR-DUP family (doc id)
    delete_from_neardup_index(spark, npath, [102])
    assert sorted(r["doc_id"] for r in read_kept_ledger(spark, kept).collect()) == [101]

    # the physical purge folds BOTH key columns' exclusions in
    purge_kept_ledger(spark, kept)
    assert sorted(r["doc_id"] for r in spark.read.parquet(kept).collect()) == [101]
    assert sorted(r["doc_id"] for r in read_kept_ledger(spark, kept).collect()) == [101]
