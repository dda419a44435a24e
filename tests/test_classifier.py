"""Learned quality classifier (operators/classifier.py): twin-proof +
learnability + scale-shape tests.

The registry query is rows-only (iterative GD over distributed float
sums), so correctness rests on (1) an exact pure-numpy twin of the
feature hashing and a tolerance twin of the training loop, (2) a
planted-signal learnability floor, (3) cardinality/contract checks."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

DIM = 64


def _py_norm(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip().lower()


def _py_fidx(tok: str, dim: int = DIM) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % dim


def _py_features(rows, dim: int = DIM):
    """{doc_id: dense tf vector} — the numpy twin of hashed_features."""
    out = {}
    for doc_id, text in rows:
        toks = [t for t in _py_norm(text).split(" ") if t]
        if not toks:
            continue
        v = np.zeros(dim)
        for t in toks:
            v[_py_fidx(t, dim)] += 1.0
        out[doc_id] = v / len(toks)
    return out


def _py_train(feats, labels, dim=DIM, epochs=8, lr=2.0):
    ids = sorted(labels)
    X = np.stack([feats.get(i, np.zeros(dim)) for i in ids])
    y = np.array([labels[i] for i in ids], dtype=float)
    w = np.zeros(dim)
    b = 0.0
    n = len(ids)
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        e = p - y
        w -= lr * (X.T @ e) / n
        b -= lr * e.sum() / n
    return w, b


CORPUS = [
    (1, "Good clean prose with many sensible words about engines."),
    (2, "spam spam buy now spam click here spam spam"),
    (3, "Another well formed document that talks about data pipelines."),
    (4, "click buy spam now spam spam cheap cheap spam"),
    (5, "Measured, thoughtful writing with varied vocabulary and flow."),
    (6, "spam\tspam   buy spam now"),
    (7, "A third normal document mentioning spark and parquet files."),
    (8, "cheap cheap buy buy spam click click now"),
]
LABELS = {1: 1, 2: 0, 3: 1, 4: 0, 5: 1, 6: 0, 7: 1, 8: 0}


def test_hashed_features_match_numpy_twin_exactly(spark):
    from lakehouse_spark_spark.operators.classifier import hashed_features

    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["fidx"]): r["v"]
        for r in hashed_features(docs, dim=DIM).collect()
    }
    want = {}
    for doc_id, vec in _py_features(CORPUS).items():
        for j in np.nonzero(vec)[0]:
            want[(doc_id, int(j))] = vec[j]
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_reserved_stats_features_match_numpy_twin(spark):
    """with_stats appends fidx=DIM (log1p(n_tok)/10) and fidx=DIM+1
    (mean word length/10) for every doc with tokens."""
    from lakehouse_spark_spark.operators.classifier import hashed_features

    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["fidx"]): r["v"]
        for r in hashed_features(docs, dim=DIM, with_stats=True).collect()
        if r["fidx"] >= DIM
    }
    for doc_id, text in CORPUS:
        toks = [t for t in _py_norm(text).split(" ") if t]
        n = len(toks)
        assert got[(doc_id, DIM)] == pytest.approx(math.log1p(n) / 10.0, rel=1e-12)
        mean_len = sum(len(t) for t in toks) / n
        assert got[(doc_id, DIM + 1)] == pytest.approx(mean_len / 10.0, rel=1e-12)


def test_standardizer_centers_stats_and_leaves_bow_alone(spark):
    from lakehouse_spark_spark.operators.classifier import (
        apply_stats_standardizer,
        fit_stats_standardizer,
        hashed_features,
    )

    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    raw = hashed_features(docs, dim=DIM, with_stats=True)
    params = fit_stats_standardizer(raw, DIM)
    assert set(params) == {DIM, DIM + 1}
    out = apply_stats_standardizer(raw, params)
    stats = [r["v"] for r in out.filter(F.col("fidx") == DIM).collect()]
    assert np.mean(stats) == pytest.approx(0.0, abs=1e-9)
    assert np.std(stats) == pytest.approx(1.0, rel=1e-9)
    # BoW block untouched
    raw_bow = sorted(
        (r["doc_id"], r["fidx"], r["v"])
        for r in raw.filter(F.col("fidx") < DIM).collect()
    )
    out_bow = sorted(
        (r["doc_id"], r["fidx"], r["v"])
        for r in out.filter(F.col("fidx") < DIM).collect()
    )
    assert raw_bow == out_bow


def test_train_logreg_matches_numpy_twin(spark):
    from lakehouse_spark_spark.operators.classifier import hashed_features, train_logreg

    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    labels = spark.createDataFrame(list(LABELS.items()), ["doc_id", "label"])
    w, b = train_logreg(
        hashed_features(docs, dim=DIM), labels, dim=DIM, epochs=8, lr=2.0
    )
    w_ref, b_ref = _py_train(_py_features(CORPUS), LABELS)
    # distributed double sums reorder: tolerance, not equality
    assert b == pytest.approx(b_ref, rel=1e-9, abs=1e-12)
    np.testing.assert_allclose(np.array(w), w_ref, rtol=1e-9, atol=1e-12)


def test_collected_fast_path_matches_distributed_trainer(spark):
    """collect_cap takes the bounded-collect numpy path; its model must
    agree with the distributed loop to float-reordering tolerance, and
    a cap below n must fall back to the distributed loop exactly."""
    from lakehouse_spark_spark.operators.classifier import hashed_features, train_logreg

    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    labels = spark.createDataFrame(list(LABELS.items()), ["doc_id", "label"])
    feats = hashed_features(docs, dim=DIM)
    w_d, b_d = train_logreg(feats, labels, dim=DIM, epochs=8, lr=2.0)
    w_c, b_c = train_logreg(feats, labels, dim=DIM, epochs=8, lr=2.0, collect_cap=100)
    assert b_c == pytest.approx(b_d, rel=1e-9, abs=1e-12)
    np.testing.assert_allclose(np.array(w_c), np.array(w_d), rtol=1e-9, atol=1e-12)
    # cap below the label count -> distributed fallback
    w_f, b_f = train_logreg(feats, labels, dim=DIM, epochs=8, lr=2.0, collect_cap=3)
    assert b_f == pytest.approx(b_d, rel=1e-12, abs=1e-15)
    np.testing.assert_allclose(np.array(w_f), np.array(w_d), rtol=1e-12, atol=1e-15)


def test_classifier_learns_planted_signal(spark):
    """Learnability floor: scoring the training corpus must separate
    the planted spam/clean signal (accuracy >= 7/8) and score spammy
    docs strictly lower than clean ones on average."""
    from lakehouse_spark_spark.operators.classifier import (
        hashed_features,
        score_documents,
        train_logreg,
    )

    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    labels = spark.createDataFrame(list(LABELS.items()), ["doc_id", "label"])
    w, b = train_logreg(
        hashed_features(docs, dim=DIM), labels, dim=DIM, epochs=40, lr=2.0
    )
    scored = {r["doc_id"]: (r["score"], r["keep"]) for r in
              score_documents(docs, w, b, dim=DIM).collect()}
    assert len(scored) == len(CORPUS)
    acc = sum(int(scored[i][1]) == LABELS[i] for i in LABELS) / len(LABELS)
    assert acc >= 7 / 8, scored
    clean = np.mean([scored[i][0] for i, y in LABELS.items() if y == 1])
    spam = np.mean([scored[i][0] for i, y in LABELS.items() if y == 0])
    assert clean > spam + 0.2


def test_empty_and_null_docs_get_bias_only_score(spark):
    from lakehouse_spark_spark.operators.classifier import score_documents

    docs = spark.createDataFrame(
        [(1, "some words here"), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    w = [0.0] * DIM
    out = {r["doc_id"]: r["score"] for r in
           score_documents(docs, w, 2.0, dim=DIM).collect()}
    assert len(out) == 3  # every input doc scored, featureless included
    expected = 1.0 / (1.0 + math.exp(-2.0))
    assert out[2] == pytest.approx(expected)
    assert out[3] == pytest.approx(expected)


def test_registry_query_scores_every_document(spark):
    """One row per doc, a real decision boundary, and the distilled
    model must beat the base rate against its own weak labels."""
    from lakehouse_spark_spark.operators.text import gopher_quality_flags
    from lakehouse_spark_spark.plans.queries import _REGISTRY

    sf = "/root/testdata/sf0.001"
    df = _REGISTRY["quality_classifier_scores"].builder(spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    rows = df.collect()
    assert len(rows) == docs.count()
    assert {r["keep"] for r in rows} == {True, False}  # a real decision boundary
    assert all(0.0 <= r["score"] <= 1.0 for r in rows)
    lab = {
        r["doc_id"]: bool(r["keep"])
        for r in gopher_quality_flags(
            docs, "doc_id", "text", min_words=40, stopword_min=1
        ).collect()
    }
    acc = sum(bool(r["keep"]) == lab[r["doc_id"]] for r in rows) / len(rows)
    base = max(sum(lab.values()), len(lab) - sum(lab.values())) / len(lab)
    assert acc >= 0.8, (acc, base)
    assert acc > base + 0.1, (acc, base)


def test_duplicate_label_ids_fall_back_to_distributed(spark):
    """The fast path requires one label row per id; duplicated ids
    would drop all but one dup's features from the dense X. With dups,
    collect_cap must fall through to the distributed loop, whose
    semantics (every labeled row contributes) are the reference."""
    from lakehouse_spark_spark.operators.classifier import hashed_features, train_logreg

    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    dup_labels = spark.createDataFrame(
        list(LABELS.items()) + [(2, 0)], ["doc_id", "label"]
    )
    feats = hashed_features(docs, dim=DIM)
    w_d, b_d = train_logreg(feats, dup_labels, dim=DIM, epochs=4, lr=2.0)
    w_c, b_c = train_logreg(feats, dup_labels, dim=DIM, epochs=4, lr=2.0, collect_cap=100)
    assert b_c == pytest.approx(b_d, rel=1e-12, abs=1e-15)
    np.testing.assert_allclose(np.array(w_c), np.array(w_d), rtol=1e-12, atol=1e-15)


def test_fused_distill_matches_separate_composition(spark):
    """train_logreg_distill (one-action fused fit+collect+train) must
    produce the same model as the separate fit_stats_standardizer ->
    apply_stats_standardizer -> train_logreg composition, to
    float-reordering tolerance, and return the same standardizer."""
    from lakehouse_spark_spark.operators.classifier import (
        apply_stats_standardizer,
        fit_stats_standardizer,
        hashed_features,
        train_logreg,
        train_logreg_distill,
    )

    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    labels = spark.createDataFrame(list(LABELS.items()), ["doc_id", "label"])
    raw = hashed_features(docs, dim=DIM, with_stats=True)
    std_ref = fit_stats_standardizer(raw, DIM)
    w_ref, b_ref = train_logreg(
        apply_stats_standardizer(raw, std_ref),
        labels,
        dim=DIM + 2,
        epochs=8,
        lr=2.0,
        collect_cap=100,
    )
    w_f, b_f, std_f = train_logreg_distill(
        raw, labels, dim=DIM + 2, bow_dim=DIM, epochs=8, lr=2.0, collect_cap=100
    )
    assert set(std_f) == set(std_ref)
    for j in std_ref:
        assert std_f[j][0] == pytest.approx(std_ref[j][0], rel=1e-9, abs=1e-12)
        assert std_f[j][1] == pytest.approx(std_ref[j][1], rel=1e-9, abs=1e-12)
    assert b_f == pytest.approx(b_ref, rel=1e-9, abs=1e-12)
    np.testing.assert_allclose(np.array(w_f), np.array(w_ref), rtol=1e-9, atol=1e-9)


def test_fused_distill_dup_and_overcap_fall_back(spark):
    """Duplicated label ids or an over-cap label set must push the
    fused trainer onto the distributed path (Spark-fitted standardizer
    + per-epoch gradients) — same reference semantics as train_logreg's
    own fallback."""
    from lakehouse_spark_spark.operators.classifier import (
        apply_stats_standardizer,
        fit_stats_standardizer,
        hashed_features,
        train_logreg,
        train_logreg_distill,
    )

    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    raw = hashed_features(docs, dim=DIM, with_stats=True)
    std = fit_stats_standardizer(raw, DIM)
    feats_std = apply_stats_standardizer(raw, std)

    dup_labels = spark.createDataFrame(
        list(LABELS.items()) + [(2, 0)], ["doc_id", "label"]
    )
    w_d, b_d = train_logreg(feats_std, dup_labels, dim=DIM + 2, epochs=4, lr=2.0)
    w_f, b_f, std_f = train_logreg_distill(
        raw, dup_labels, dim=DIM + 2, bow_dim=DIM, epochs=4, lr=2.0, collect_cap=100
    )
    assert std_f == std
    assert b_f == pytest.approx(b_d, rel=1e-12, abs=1e-15)
    np.testing.assert_allclose(np.array(w_f), np.array(w_d), rtol=1e-12, atol=1e-15)

    labels = spark.createDataFrame(list(LABELS.items()), ["doc_id", "label"])
    w_o, b_o = train_logreg(feats_std, labels, dim=DIM + 2, epochs=4, lr=2.0)
    w_g, b_g, _ = train_logreg_distill(
        raw, labels, dim=DIM + 2, bow_dim=DIM, epochs=4, lr=2.0, collect_cap=3
    )
    assert b_g == pytest.approx(b_o, rel=1e-12, abs=1e-15)
    np.testing.assert_allclose(np.array(w_g), np.array(w_o), rtol=1e-12, atol=1e-15)


def test_fused_distill_empty_labels(spark):
    from lakehouse_spark_spark.operators.classifier import (
        hashed_features,
        train_logreg_distill,
    )

    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    raw = hashed_features(docs, dim=DIM, with_stats=True)
    empty = spark.createDataFrame([], "doc_id long, label int")
    w, b, std = train_logreg_distill(
        raw, empty, dim=DIM + 2, bow_dim=DIM, epochs=4, lr=2.0, collect_cap=100
    )
    assert w == [0.0] * (DIM + 2) and b == 0.0 and std == {}


def test_collapsed_scorer_matches_feature_composition(spark):
    """score_documents folds the BoW logit into a single per-doc
    groupBy over token weights; it must equal the explicit
    hashed_features -> standardize -> _scores composition up to float
    re-association, including the stats features and empty docs."""
    from lakehouse_spark_spark.operators.classifier import (
        _scores,
        apply_stats_standardizer,
        fit_stats_standardizer,
        hashed_features,
        score_documents,
        train_logreg_distill,
    )

    docs = spark.createDataFrame(
        CORPUS + [(9, ""), (10, "   ")], ["doc_id", "text"]
    )
    labels = spark.createDataFrame(list(LABELS.items()), ["doc_id", "label"])
    raw_train = hashed_features(docs, dim=DIM, with_stats=True)
    w, b, std = train_logreg_distill(
        raw_train, labels, dim=DIM + 2, bow_dim=DIM, epochs=6, lr=2.0, collect_cap=100
    )

    got = {
        r["doc_id"]: r["score"]
        for r in score_documents(
            docs, w, b, dim=DIM, with_stats=True, standardizer=std
        ).collect()
    }
    feats = apply_stats_standardizer(
        hashed_features(docs, dim=DIM, with_stats=True), std
    )
    ref_logit = {r["doc_id"]: r["logit"] for r in _scores(feats, w, b, "doc_id").collect()}
    assert set(got) == {r["doc_id"] for r in docs.collect()}
    for d, s in got.items():
        logit = ref_logit.get(d, b)  # empty docs: bias-only
        ref = 1.0 / (1.0 + math.exp(-logit))
        assert s == pytest.approx(ref, rel=1e-9, abs=1e-12), d
