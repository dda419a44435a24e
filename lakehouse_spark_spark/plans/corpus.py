"""The composed training-data pipeline: what a user of this engine runs
end-to-end over a raw document corpus.

    raw documents
      → quality gate          (operators/text: length/lang/stopword rules)
      → exact dedup           (content-hash groupBy, keep min doc_id)
      → near-dup removal      (pair detection → drop the younger doc)
      → accounting            (docs/tokens kept & dropped, by reason)

Two near-dup backends with identical downstream semantics:
- ``exact``: inverted-index n-gram Jaccard (oracle-checkable; the
  verification-quality path);
- ``minhash``: LSH candidates + exact verification of candidates only
  (the 100 TB path — same results whenever LSH recall holds at the
  threshold, which the banding parameters are chosen for).

Two drop policies for near-dups, both deterministic:
- ``pairwise`` (default): drop the HIGHER doc_id of every pair — keeps
  every local minimum of the pair graph.
- ``cluster``: connected components over the pair graph
  (operators/graph.py), keep exactly ONE doc (the min id) per
  transitive cluster — the standard corpus-dedup semantics (one
  representative per dup group), and the policy you want at 100 TB
  where chains a~b~c are common near the threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_spark_spark.operators import text as tx
from lakehouse_spark_spark.operators.dedup import content_hash
from lakehouse_spark_spark.operators.neardup import (
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    verify_pairs_jaccard,
)


def quality_verdict() -> F.Column:
    n_tok = tx.n_tokens("text")
    sw = tx.stopword_ratio("text")
    return (
        F.when(n_tok < 10, F.lit("too_short"))
        .when(n_tok > 1000, F.lit("too_long"))
        .when(~F.col("lang").isin("en", "de", "es", "fr"), F.lit("lang_filtered"))
        .when(sw < 0.01, F.lit("low_quality"))
        .otherwise(F.lit("keep"))
    )


def prepare_corpus(
    docs: DataFrame,
    jaccard_threshold: float = 0.8,
    neardup_backend: str = "exact",
    drop_policy: str = "pairwise",
) -> DataFrame:
    """Returns every input doc_id with its final disposition:
    ``verdict`` ∈ {kept, too_short, too_long, lang_filtered,
    low_quality, exact_dup, near_dup}."""
    judged = docs.select("doc_id", "lang", "text", quality_verdict().alias("q"))
    passed = judged.filter(F.col("q") == "keep")

    # exact dedup among quality-passing docs: keep min doc_id per hash.
    # keep_ids is O(distinct docs) — no broadcast hint (AQE decides; a
    # forced hint would cap the corpus at driver memory).
    hashed = passed.select("doc_id", "text", content_hash("text").alias("h"))
    keep_ids = hashed.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    exact_kept = hashed.join(
        keep_ids, (hashed["h"] == keep_ids["h"]) & (hashed["doc_id"] == keep_ids["keep_id"])
    ).select("doc_id", "text")

    # near-dup pairs among the exact-dedup survivors
    if neardup_backend == "minhash":
        # the scale path: LSH candidate generation, then exact Jaccard
        # computed ONLY on candidate pairs — the inverted-index
        # all-pairs self-join never runs.
        sigs = minhash_signatures(exact_kept, "doc_id", "text", n=3, num_hashes=64)
        cands = minhash_lsh_candidates(sigs, "doc_id", bands=16, num_hashes=64)
        verified = verify_pairs_jaccard(exact_kept, cands, "doc_id", "text", n=3, threshold=jaccard_threshold)
        pairs = verified.select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    else:
        pairs = ngram_jaccard_pairs(exact_kept, "doc_id", "text", n=3, threshold=jaccard_threshold).select(
            "doc_a", "doc_b"
        )
    if drop_policy == "cluster":
        # transitive closure: one representative (min id) per dup cluster
        from lakehouse_spark_spark.operators.graph import connected_components

        comp = connected_components(pairs, src="doc_a", dst="doc_b")
        near_dropped = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
    else:
        # drop the younger (higher id) of each pair; doc_a < doc_b by construction
        near_dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()

    disposition = (
        judged.select("doc_id", "q")
        .join(exact_kept.select("doc_id", F.lit(True).alias("__exact_kept")), "doc_id", "left")
        .join(near_dropped.select("doc_id", F.lit(True).alias("__near_dropped")), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("q") != "keep", F.col("q"))
            .when(F.col("__exact_kept").isNull(), F.lit("exact_dup"))
            .when(F.col("__near_dropped").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
        )
    )
    return disposition


def corpus_report(docs: DataFrame, disposition: DataFrame) -> DataFrame:
    """Per-verdict accounting: docs and (exact integer) token totals."""
    n_tok = tx.n_tokens("text").cast("long")
    joined = docs.select("doc_id", n_tok.alias("n_tokens")).join(disposition, "doc_id")
    return joined.groupBy("verdict").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def _main() -> None:
    """CLI: run the composed corpus pipeline (quality gate -> exact
    dedup -> near-dup -> disposition + report) over a documents parquet
    and write both outputs as parquet."""
    import argparse
    import time

    from lakehouse_spark_spark.session import get_session
    from lakehouse_spark_spark.sources.loaders import load_table

    ap = argparse.ArgumentParser(description="training-corpus preparation pipeline")
    ap.add_argument("--sf-dir", required=True, help="directory holding documents.parquet")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--backend", default="minhash", choices=["exact", "minhash"], help="near-dup backend")
    ap.add_argument("--drop-policy", default="pairwise", choices=["pairwise", "cluster"])
    ap.add_argument("--jaccard", type=float, default=0.8)
    args = ap.parse_args()

    spark = get_session("corpus_cli")
    t0 = time.perf_counter()
    docs = load_table(spark, args.sf_dir, "documents")
    disposition = prepare_corpus(
        docs, jaccard_threshold=args.jaccard, neardup_backend=args.backend, drop_policy=args.drop_policy
    )
    disposition.write.mode("overwrite").parquet(f"{args.out}/disposition")
    report = corpus_report(docs, spark.read.parquet(f"{args.out}/disposition"))
    report.write.mode("overwrite").parquet(f"{args.out}/report")
    n = spark.read.parquet(f"{args.out}/disposition").count()
    print(f"corpus pipeline done in {time.perf_counter() - t0:.1f}s -> {args.out} ({n} docs)")


if __name__ == "__main__":
    _main()
