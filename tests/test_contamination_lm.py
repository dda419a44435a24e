"""Unit tests for eval-set decontamination, corpus unigram LM scoring,
and token chunking on tiny literal data."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_contamination_hits_and_decontaminate(spark):
    from lakehouse_spark_spark.operators.contamination import contamination_hits, decontaminate

    # doc 1 contains the eval 4-gram "a b c d"; doc 2 is clean; doc 3
    # shares with BOTH eval docs.
    train = spark.createDataFrame(
        [
            (1, "x a b c d y"),
            (2, "totally unrelated text here now"),
            (3, "a b c d plus p q r s"),
            (4, "short"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, "a b c d"), (101, "p q r s")], ["doc_id", "text"]
    )
    hits = {r["doc_id"]: r for r in contamination_hits(train, eval_df, "doc_id", "text", n=4).collect()}
    assert set(hits) == {1, 3}
    assert hits[1]["n_shared_ngrams"] == 1 and hits[1]["n_eval_docs"] == 1
    assert hits[3]["n_shared_ngrams"] == 2 and hits[3]["n_eval_docs"] == 2

    disp = {r["doc_id"]: r for r in decontaminate(train, eval_df, "doc_id", "text", n=4).collect()}
    assert len(disp) == 4  # every input doc gets a disposition row
    assert disp[2]["keep"] and disp[4]["keep"]
    assert not disp[1]["keep"] and not disp[3]["keep"]
    assert disp[4]["n_shared_ngrams"] == 0  # shorter than one shingle


def test_decontaminate_max_shared_threshold(spark):
    from lakehouse_spark_spark.operators.contamination import decontaminate

    train = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    eval_df = spark.createDataFrame([(9, "a b c d e")], ["doc_id", "text"])
    # 2 shared 4-grams ("a b c d", "b c d e"); max_shared=2 keeps it
    out = decontaminate(train, eval_df, "doc_id", "text", n=4, max_shared=2).collect()[0]
    assert out["n_shared_ngrams"] == 2 and out["keep"]


def test_unigram_vocab_and_doc_logprob(spark):
    from lakehouse_spark_spark.operators.lm import doc_logprob, unigram_vocab

    # corpus: 4x 'a', 2x 'b', 2x 'c' -> p(a)=.5, p(b)=p(c)=.25
    df = spark.createDataFrame([(1, "a a b c"), (2, "a a b c")], ["doc_id", "text"])
    vocab = {r["token"]: r for r in unigram_vocab(df, "text").collect()}
    assert vocab["a"]["n"] == 4
    assert float(vocab["a"]["logp"]) == pytest.approx(round(math.log(0.5), 6), abs=1e-6)
    assert float(vocab["b"]["logp"]) == pytest.approx(round(math.log(0.25), 6), abs=1e-6)

    scores = {r["doc_id"]: r for r in doc_logprob(df, "doc_id", "text").collect()}
    expected_sum = round(2 * round(math.log(0.5), 6) + 2 * round(math.log(0.25), 6), 6)
    for d in (1, 2):  # identical docs, identical exact sums
        assert scores[d]["n_scored"] == 4
        assert scores[d]["sum_logp"] == pytest.approx(expected_sum, abs=1e-9)
        assert scores[d]["avg_logp"] == pytest.approx(round(expected_sum / 4, 6), abs=1e-6)


def test_doc_logprob_external_vocab(spark):
    from lakehouse_spark_spark.operators.lm import doc_logprob, unigram_vocab

    corpus = spark.createDataFrame([(1, "a a b")], ["doc_id", "text"])
    vocab = unigram_vocab(corpus, "text")
    # scoring doc has an OOV token 'z' -> dropped by the inner join
    target = spark.createDataFrame([(7, "a z")], ["doc_id", "text"])
    row = doc_logprob(target, "doc_id", "text", vocab=vocab).collect()[0]
    assert row["n_scored"] == 1
    assert row["avg_logp"] == pytest.approx(round(math.log(2 / 3), 6), abs=1e-6)


def test_doc_chunks_shapes(spark):
    from lakehouse_spark_spark.operators.text import doc_chunks

    letters = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, letters), (2, "one two"), (3, "solo")], ["doc_id", "text"])
    out = doc_chunks(df, "doc_id", "text", chunk_tokens=4, overlap=1).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 1,4,7 -> chunks [t0..t3],[t3..t6],[t6..t9]
    assert [r["chunk_text"] for r in by_doc[1]] == [
        "t0 t1 t2 t3",
        "t3 t4 t5 t6",
        "t6 t7 t8 t9",
    ]
    assert [r["chunk_tokens"] for r in by_doc[1]] == [4, 4, 4]
    # overlap: consecutive chunks share exactly 1 token
    assert by_doc[1][0]["chunk_text"].split()[-1] == by_doc[1][1]["chunk_text"].split()[0]
    # short docs: exactly one (possibly short) chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_tokens"] == 2
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_text"] == "solo"


def test_doc_chunks_rejects_bad_overlap(spark):
    from lakehouse_spark_spark.operators.text import doc_chunks

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        doc_chunks(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_source_reputation_query_shape(spark):
    """The registered query's semantics on literal rows: a source whose
    docs all fail the gate is flagged, docs inherit the source rate."""
    from lakehouse_spark_spark.plans.corpus import quality_verdict

    rows = [
        (1, "en", "good", " ".join(["the one of and is fine"] * 5)),
        (2, "en", "good", " ".join(["the cat of the hat is here"] * 4)),
        (3, "zz", "spam", "xx yy zz aa bb cc dd ee ff gg hh ii"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"])
    m = df.select("doc_id", "source", F.when(quality_verdict() == "keep", 1).otherwise(0).alias("keep"))
    rep = m.groupBy("source").agg(F.round(F.sum("keep") / F.count(F.lit(1)), 6).alias("keep_rate"))
    rates = {r["source"]: r["keep_rate"] for r in rep.collect()}
    assert rates["good"] == 1.0 and rates["spam"] == 0.0


def test_persisted_decon_index_matches_oneshot_and_is_eval_free(spark, tmp_path):
    """r11 persisted decon index: build over eval set 1, fold eval set 2
    (watermark-idempotent), probe a training batch — the disposition is
    EXACTLY the one-shot decontaminate over the eval union, the probe
    plan never touches the eval parquet (deleted before execution), and
    replay-duplicated pair rows cannot change any disposition
    (distinct-count arithmetic)."""
    import shutil

    from lakehouse_spark_spark.operators.contamination import (
        decontaminate,
        decontaminate_against_index,
        load_decon_index,
        update_decon_index,
        write_decon_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    ev1 = docs.filter("doc_id % 97 = 0")
    ev2 = docs.filter("doc_id % 89 = 3")
    train = docs.filter("doc_id % 3 = 0")

    ev_dir = str(tmp_path / "eval_parquet")
    ev2_dir = str(tmp_path / "eval2_parquet")
    ev1.write.parquet(ev_dir)
    ev2.write.parquet(ev2_dir)  # own dir, so ITS absence from the probe
    # plan is a real assertion too (not masked by documents.parquet)
    idx_path = str(tmp_path / "decon_idx")
    write_decon_index(spark.read.parquet(ev_dir), "doc_id", "text", idx_path, n=8)
    update_decon_index(idx_path, spark.read.parquet(ev2_dir), "doc_id", "text", batch_id=1)
    n_pairs = load_decon_index(spark, idx_path).shingles.count()
    # replayed fold: watermark no-op
    update_decon_index(idx_path, spark.read.parquet(ev2_dir), "doc_id", "text", batch_id=1)
    assert load_decon_index(spark, idx_path).shingles.count() == n_pairs

    shutil.rmtree(ev_dir)  # the index is now the ONLY eval state
    shutil.rmtree(ev2_dir)
    idx = load_decon_index(spark, idx_path)
    out = decontaminate_against_index(train, idx, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "eval_parquet" not in plan and "eval2_parquet" not in plan
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(
        tuple(r)
        for r in decontaminate(train, ev1.unionByName(ev2), "doc_id", "text", n=8).collect()
    )
    assert got == want
    assert any(not r[3] for r in got)  # non-vacuous: real contamination found
    # duplicate pair rows (replayed half-append) change nothing
    idx.shingles.limit(50).write.mode("append").parquet(f"{idx_path}/shingles")
    dup_idx = load_decon_index(spark, idx_path)
    got_dup = sorted(
        tuple(r)
        for r in decontaminate_against_index(train, dup_idx, "doc_id", "text").collect()
    )
    assert got_dup == got
