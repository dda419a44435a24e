"""Corpus retrieval and importance-reweighting operators:

- BM25 top-k document search (Robertson/Spärck Jones; the Lucene idf
  variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``) — term statistics are
  computed from the corpus itself, scoring is an equi-join of the tiny
  per-term posting aggregates against per-document term frequencies.
- DSIR-style importance weights (Xie et al., "Data Selection for
  Language Models via Importance Resampling", NeurIPS 2023): per-token
  log-ratio of a *target* unigram distribution vs the *raw* corpus
  distribution (add-one smoothed over the shared vocabulary), summed
  per document. Documents that look like the target domain get high
  weights; resample the corpus proportionally.

Cross-engine determinism (driver DuckDB-oracle hash gate): every
per-token/per-term log value is ROUNDED to 6 decimals and cast
DECIMAL(18,6) BEFORE the per-document sum — decimal sums are exact and
order-independent, so Spark and DuckDB emit bit-identical doubles.
Ratios handed to ``ln`` are double divisions of exact int64 products —
IEEE-identical in both engines.

Scale design (100 TB):
- BM25: df/idf live in a |query-terms|-row table (broadcast); tf rows
  are filtered to query terms AT THE SCAN (an ``isin`` pushdown), so
  the shuffle carries only matching postings. Document length (dl) is
  a per-doc aggregate computed once; at production scale you persist
  it as a column and skip that pass. Top-k is TakeOrderedAndProject —
  no global sort materialization.
- DSIR: both vocab tables shuffle by token (Zipf-safe: heavy tokens
  are one row each after the count agg); the scoring join is
  token-keyed, same shape as the unigram LM (operators/lm.py), and
  the head/tail broadcast split there applies verbatim if the vocab
  join skews.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_spark_spark.operators.text import norm_text


def _toks(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), F.explode(F.split(norm_text(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 25,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25.

    Returns (id, score, rank) — score is the decimal-exact sum of
    6-decimal-rounded per-term contributions, rank the dense position
    under (score DESC, id ASC).

    No checkpoint on the token stream: warm A/B at sf0.1 has recompute
    at 1.34-1.76 s vs 1.66-2.12 s materialized — the scan+explode is
    cheaper than writing the token table (dsir/tfidf keep theirs: their
    A/Bs were a wash and their derived tables are join products). A
    serving pipeline answering MANY queries would instead persist
    tf/dl/idf as tables once."""
    toks = _toks(df, id_col, text_col)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
    )
    qt = toks.filter(F.col("token").isin(query_terms))
    dfreq = qt.groupBy("token").agg(F.count_distinct(F.col(id_col)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "token",
        F.round(
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)), 6
        )
        .cast("decimal(18,6)")
        .alias("idf"),
        "avgdl",
    )
    tf = qt.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    contrib = (
        tf.join(dl, id_col)
        .join(F.broadcast(idf), "token")
        .select(
            F.col(id_col),
            F.round(
                F.col("idf").cast("double")
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
                6,
            )
            .cast("decimal(18,6)")
            .alias("__c"),
        )
    )
    scored = contrib.groupBy(id_col).agg(
        F.sum("__c").cast("decimal(20,6)").cast("double").alias("score")
    )
    top = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    # rank via the distributed prefix (operators/distrank.py): the input
    # is ≤ k rows post-limit so a global window would be harmless, but
    # it still instantiates a single-partition WindowExec (runtime WARN);
    # the prefix primitive costs one tiny extra job and keeps the whole
    # registry free of unpartitioned windows.
    from lakehouse_spark_spark.operators.distrank import with_global_prefix

    ranked, _ = with_global_prefix(top, [F.col("score").desc(), F.col(id_col)])
    return ranked.withColumn("rank", F.col("__rn").cast("int")).drop("__rn")


def dsir_logweights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred,
) -> DataFrame:
    """Per-document DSIR importance log-weight: Σ_tokens
    round(ln(p_target(w) / p_raw(w)), 6), add-one smoothed over the raw
    corpus vocabulary. ``target_pred`` is a Column predicate selecting
    the target-domain subset of ``df``.

    Returns (id, n_tokens, log_weight, avg_logratio)."""
    toks = _toks(df, id_col, text_col).localCheckpoint(eager=False)
    target_ids = df.filter(target_pred).select(F.col(id_col))
    raw = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt = toks.join(target_ids, id_col).groupBy("token").agg(F.count(F.lit(1)).alias("c_tgt"))
    vocab = raw.join(tgt, "token", "left").na.fill({"c_tgt": 0})
    totals = vocab.agg(
        F.sum("c_raw").alias("t_raw"),
        F.sum("c_tgt").alias("t_tgt"),
        F.count(F.lit(1)).alias("v"),
    )
    lw = vocab.crossJoin(F.broadcast(totals)).select(
        "token",
        F.round(
            F.log(
                (
                    ((F.col("c_tgt") + 1) * (F.col("t_raw") + F.col("v"))).cast("double")
                )
                / (((F.col("c_raw") + 1) * (F.col("t_tgt") + F.col("v"))).cast("double"))
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("lw"),
    )
    from lakehouse_spark_spark.operators.stats import decimal_avg6

    return (
        toks.join(lw, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lw").cast("decimal(20,6)").cast("double").alias("log_weight"),
            decimal_avg6(F.sum("lw").cast("decimal(20,6)"), F.count(F.lit(1))).alias("avg_logratio"),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str] | None = None,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """Document-pair cosine similarity over TF-IDF weighted bag-of-words
    via a sparse dot-product self-join (the inverted-index formulation
    MLlib's DIMSUM optimizes): pairs materialize ONLY through shared
    terms, never a cross join.

    ``block_cols`` restricts candidate pairs to equal blocking keys
    (classic entity-resolution blocking — at 100 TB you block, cap, or
    both; this corpus's tiny synthetic vocabulary makes every token a
    stop word, so blocking is what keeps the join linear here).
    ``df_cap`` additionally drops terms whose document frequency
    exceeds the cap (the Jaccard df-cap treatment).

    Determinism: idf is 6-decimal-rounded, per-term weights are
    6-decimal decimals, norms and dots are exact decimal sums of
    decimal products — the emitted cosine is bit-stable cross-engine.

    Output: (id_a, id_b, cosine_sim) for pairs ≥ threshold."""
    block_cols = block_cols or []
    toks = _toks_keep(df, id_col, text_col, block_cols)
    n_docs = df.select(F.count(F.lit(1)).alias("n")).withColumnRenamed("n", "__n")
    dfreq = toks.select(id_col, "token").distinct().groupBy("token").agg(
        F.count(F.lit(1)).alias("__df")
    )
    if df_cap is not None:
        dfreq = dfreq.filter(F.col("__df") <= df_cap)
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "token",
        F.round(F.log(F.col("__n").cast("double") / F.col("__df")), 6).cast("decimal(18,6)").alias("__idf"),
    )
    tf = toks.groupBy(id_col, "token", *block_cols).agg(F.count(F.lit(1)).alias("__tf"))
    w = tf.join(idf, "token").select(
        id_col,
        "token",
        *block_cols,
        F.round(F.col("__tf") * F.col("__idf").cast("double"), 6).cast("decimal(18,6)").alias("__w"),
    ).localCheckpoint(eager=False)
    norms = w.groupBy(id_col).agg(
        F.sqrt(F.sum((F.col("__w") * F.col("__w")).cast("decimal(30,12)")).cast("double")).alias("__nrm")
    )
    a = w.select(F.col(id_col).alias("id_a"), "token", *block_cols, F.col("__w").alias("__wa"))
    b = w.select(F.col(id_col).alias("id_b"), "token", *block_cols, F.col("__w").alias("__wb"))
    dots = (
        a.join(b, ["token", *block_cols])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum((F.col("__wa") * F.col("__wb")).cast("decimal(30,12)")).alias("__dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("__nrm").alias("__na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("__nrm").alias("__nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("__dot").cast("double") / (F.col("__na") * F.col("__nb")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def _toks_keep(df: DataFrame, id_col: str, text_col: str, keep_cols: list[str]) -> DataFrame:
    return df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        F.explode(F.split(norm_text(text_col), " ")).alias("token"),
    ).filter(F.col("token") != "")
