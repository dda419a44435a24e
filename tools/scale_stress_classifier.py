"""Classifier scale stress: training cost must be CORPUS-SIZE-
INDEPENDENT (the md5-rank sample caps it), scoring must stay linear.

The synthetic corpus is generated distributed (spark.range +
expressions — no driver-side data): 12 md5-derived pseudo-words per
doc, with a planted marker phrase on id%2==0 docs that also defines the
weak label, so the classifier has real signal at every size.

Usage:  python tools/scale_stress_classifier.py [n_base] [factor]
Prints one JSON line: train/score walls at n and factor*n, the wall
ratios, and the held-out ranking AUC at both sizes.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def make_docs(spark, n: int):
    from pyspark.sql import functions as F

    words = F.transform(
        F.sequence(F.lit(1), F.lit(12)),
        lambda i: F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit("_"), i.cast("string"))), 1, 5),
    )
    marker = F.when(F.col("id") % 2 == 0, F.lit(" prime quality marker signal")).otherwise(
        F.lit(" junk noise filler")
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.array_join(words, " "), marker).alias("text"),
        (F.col("id") % 2 == 0).cast("int").alias("label"),
    )


def run_once(spark, n: int, dim: int = 256, sample_n: int = 2000, epochs: int = 8):
    from pyspark.sql import functions as F

    from lakehouse_spark_spark.operators.classifier import (
        hashed_features,
        score_documents,
        train_logreg,
    )

    docs = make_docs(spark, n).persist()
    docs.count()  # materialize outside the timed sections
    t0 = time.perf_counter()
    sample = docs.orderBy(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
    ).limit(sample_n)
    feats = hashed_features(sample, dim=dim)
    w, b = train_logreg(feats, sample.select("doc_id", "label"), dim=dim, epochs=epochs, lr=4.0)
    train_sec = time.perf_counter() - t0
    t1 = time.perf_counter()
    scored = score_documents(docs, w, b, dim=dim).join(
        docs.select("doc_id", "label"), "doc_id"
    )
    # Mann-Whitney AUC from score ranks: the honest separation metric
    # for a few-epoch linear model (the 0.5 threshold converges much
    # later than the ranking does). Global rank is tool-only — the
    # registry's distributed-rank operators are the production path.
    from pyspark.sql import Window

    ranked = scored.withColumn("r", F.row_number().over(Window.orderBy("score", "doc_id")))
    agg = ranked.agg(
        F.sum(F.when(F.col("label") == 1, F.col("r"))).alias("rpos"),
        F.sum(F.col("label")).alias("n1"),
        F.count(F.lit(1)).alias("nn"),
    ).first()
    n1, n0 = int(agg["n1"]), int(agg["nn"]) - int(agg["n1"])
    auc = (float(agg["rpos"]) - n1 * (n1 + 1) / 2) / (n1 * n0)
    score_sec = time.perf_counter() - t1
    docs.unpersist()
    return {"n_docs": n, "train_sec": round(train_sec, 2), "score_sec": round(score_sec, 2), "auc": round(auc, 4)}


def main() -> None:
    from lakehouse_spark_spark.session import get_session

    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_session("clf_stress")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()  # warm Arrow workers
    base = run_once(spark, n_base)
    big = run_once(spark, n_base * factor)
    print(
        json.dumps(
            {
                "stress": "classifier_sample_bounded_training",
                "base": base,
                "scaled": big,
                "factor": factor,
                "train_wall_ratio": round(big["train_sec"] / base["train_sec"], 2),
                "score_wall_ratio": round(big["score_sec"] / base["score_sec"], 2),
                "train_is_corpus_size_independent": big["train_sec"] / base["train_sec"] < 2.0,
            }
        )
    )


if __name__ == "__main__":
    main()
