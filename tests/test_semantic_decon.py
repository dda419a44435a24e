"""semantic_contamination (operators/similarity.py): literal-vector
unit tests — the registry query's planted-dup oracle covers the
corpus-scale path; these pin the operator semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_spark_spark.operators.similarity import semantic_contamination


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


def test_flags_exact_and_near_matches(spark):
    ev = _df(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    corpus = _df(
        spark,
        [
            (10, [2.0, 0.0]),      # colinear with eval 1 -> cos 1.0
            (11, [1.0, 1.0]),      # cos ~0.7071 to both
            (12, [-1.0, 0.0]),     # cos -1 / 0
            (13, [0.0, 0.5]),      # colinear with eval 2
        ],
    )
    out = {
        r["corpus_id"]: (r["max_eval_sim"], r["n_eval_hits"], r["contaminated"])
        for r in semantic_contamination(corpus, ev, "vec_id", "embedding", threshold=0.9).collect()
    }
    assert out[10] == (1.0, 1, True)
    assert out[13] == (1.0, 1, True)
    assert out[11][2] is False and abs(out[11][0] - 0.707107) < 1e-6
    assert out[12] == (0.0, 0, False)


def test_hit_count_counts_all_eval_matches(spark):
    ev = _df(spark, [(1, [1.0, 0.0]), (2, [3.0, 0.0])])  # two colinear eval vecs
    corpus = _df(spark, [(10, [5.0, 0.0])])
    r = semantic_contamination(corpus, ev, "vec_id", "embedding", threshold=0.9).collect()[0]
    assert (r["n_eval_hits"], r["contaminated"]) == (2, True)
