"""Scale guards on the verification-only exact baselines, and the
LSH-verified production twin's equivalence with brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_embedding_bruteforce_guard_trips(spark):
    from lakehouse_spark_spark.operators.similarity import embedding_neardup_pairs
    from lakehouse_spark_spark.sources.loaders import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    with pytest.raises(ValueError, match="VERIFICATION-ONLY"):
        embedding_neardup_pairs(emb, "vec_id", "embedding", max_rows=10).count()
    # explicit opt-out runs (plan only built lazily; count a tiny slice)
    out = embedding_neardup_pairs(
        emb.limit(20), "vec_id", "embedding", threshold=-1.0, allow_bruteforce=True
    )
    assert out.count() == 20 * 19 // 2


def test_ngram_uncapped_guard_trips(spark):
    from lakehouse_spark_spark.operators.neardup import ngram_jaccard_pairs
    from lakehouse_spark_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    with pytest.raises(ValueError, match="VERIFICATION-ONLY"):
        ngram_jaccard_pairs(docs, "doc_id", "text", max_rows_uncapped=10).count()
    # the capped production form never trips the guard
    assert ngram_jaccard_pairs(docs, "doc_id", "text", max_df=200, threshold=0.2).count() >= 0


def test_lsh_verified_equals_bruteforce(spark):
    """The equivalence proof the registry gate also runs: banded RP-LSH
    candidates + exact verify emits the identical pair set."""
    from lakehouse_spark_spark.operators.similarity import (
        embedding_neardup_lsh_verified,
        embedding_neardup_pairs,
    )
    from lakehouse_spark_spark.plans.queries import _fixed_planes
    from lakehouse_spark_spark.sources.loaders import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    brute = embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.45, allow_bruteforce=True)
    planes = _fixed_planes(n_planes=192, dim=64)
    bands = [planes[i : i + 4] for i in range(0, 192, 4)]
    lsh = embedding_neardup_lsh_verified(emb, "vec_id", "embedding", bands, threshold=0.45)
    b = {(r["id_a"], r["id_b"], r["cosine_sim"]) for r in brute.collect()}
    l = {(r["id_a"], r["id_b"], r["cosine_sim"]) for r in lsh.collect()}
    assert b == l
