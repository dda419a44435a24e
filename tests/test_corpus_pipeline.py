"""Composed training-corpus pipeline: backend equivalence and semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_minhash_backend_equals_exact_backend(spark):
    """LSH-candidates + exact verification must produce the SAME final
    dispositions as full exact Jaccard at threshold 0.8 (LSH recall at
    j>=0.8 with 16x4 banding is ~0.9997; on this corpus it is exact)."""
    from lakehouse_spark_spark.plans.corpus import prepare_corpus
    from lakehouse_spark_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    exact = {(r["doc_id"], r["verdict"]) for r in prepare_corpus(docs, 0.8, "exact").collect()}
    mh = {(r["doc_id"], r["verdict"]) for r in prepare_corpus(docs, 0.8, "minhash").collect()}
    assert exact == mh


def test_disposition_covers_every_doc_exactly_once(spark):
    from lakehouse_spark_spark.plans.corpus import prepare_corpus
    from lakehouse_spark_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    disp = prepare_corpus(docs)
    assert disp.count() == docs.count()
    assert disp.select("doc_id").distinct().count() == docs.count()
    verdicts = {r["verdict"] for r in disp.select("verdict").distinct().collect()}
    assert verdicts <= {"kept", "too_short", "too_long", "lang_filtered", "low_quality", "exact_dup", "near_dup"}
    assert "kept" in verdicts


def test_synthetic_dups_are_dropped(spark):
    """Planted duplicates: an exact copy and a near-copy of a kept doc
    must come back as exact_dup / near_dup, originals stay kept."""
    from lakehouse_spark_spark.plans.corpus import prepare_corpus

    base = " ".join(f"tok{i % 40}" for i in range(80)) + " the a of and is"
    near = base.replace("tok1 ", "changed ", 1)
    rows = [
        (1, "en", base),
        (2, "en", base),          # exact dup of 1
        (3, "en", near),          # near dup of 1 (jaccard >= 0.8)
        (4, "en", " ".join(f"zz{i % 37}" for i in range(80)) + " the a"),  # independent
        (5, "en", "short text"),  # too_short
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = {r["doc_id"]: r["verdict"] for r in prepare_corpus(docs, 0.8).collect()}
    assert got[1] == "kept"
    assert got[2] == "exact_dup"
    assert got[3] == "near_dup"
    assert got[4] == "kept"
    assert got[5] == "too_short"
