"""Corpus unigram language-model scoring — the CCNet-style "perplexity
bucket" quality signal, computed from the corpus itself (no external
model): documents whose tokens are improbable under the corpus unigram
distribution are outliers (gibberish, boilerplate, wrong language);
documents that are too probable are template spam.

Two passes, both scan-shaped:
  1. vocab: explode tokens → groupBy token → counts (map-side combine
     collapses each partition to its distinct tokens before the
     shuffle; the shuffle carries the vocabulary, not the corpus).
  2. score: re-explode tokens, equi-join the vocab on token, aggregate
     per doc. The vocab is Zipf-skewed but the join is a hash join on
     the token — at 100 TB you'd broadcast the top-K head of the vocab
     and shuffle only the tail (the head covers ~95% of token mass).

Determinism contract (the reason for the decimal dance): per-token
log-probs are ROUNDED to 6 decimals and cast DECIMAL(18,6) BEFORE the
per-document sum, so the aggregation is exact integer arithmetic —
order-independent and bit-identical across Spark and the DuckDB oracle.
Raw double summation would differ in the last ulp by partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_spark_spark.operators.text import norm_text


def unigram_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(token, n, logp): corpus unigram counts and natural-log
    probability rounded to 6 decimals (see module determinism note)."""
    toks = df.select(F.explode(F.split(norm_text(text_col), " ")).alias("token")).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    total = counts.select(F.sum("n").alias("__total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "token",
        "n",
        F.round(F.log(F.col("n").cast("double") / F.col("__total")), 6)
        .cast("decimal(18,6)")
        .alias("logp"),
    )


def doc_logprob(
    df: DataFrame, id_col: str, text_col: str, vocab: DataFrame | None = None, head_k: int | None = None
) -> DataFrame:
    """Per-document unigram log-likelihood stats under the corpus vocab:

    (id, n_scored, sum_logp, avg_logp) — avg_logp is the mean per-token
    natural-log probability (more negative = more surprising). Pass a
    pre-computed ``vocab`` (from ``unigram_vocab``, possibly persisted)
    to skip the counting pass; by default it is built from ``df``
    itself, so every token is in-vocabulary and n_scored = n_tokens.

    ``head_k`` enables the 100 TB skew technique the module docstring
    describes: the vocab is Zipf-distributed, so its top-K head covers
    ~95% of TOKEN MASS while being broadcast-tiny. With ``head_k`` set,
    head tokens are scored via a broadcast join (the heavy, skewed
    traffic never shuffles — 'the' alone would otherwise hammer one
    reducer) and only the long-tail tokens take the shuffle join; the
    union feeds one aggregation. Result is IDENTICAL to the plain join
    (tests + the shared oracle prove it); only the physical traffic
    changes.

    The decimal per-token rounding makes sum/avg exact and
    order-independent (module docstring)."""
    if vocab is None:
        vocab = unigram_vocab(df, text_col)
    toks = df.select(
        F.col(id_col), F.explode(F.split(norm_text(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    if head_k is None:
        scored = toks.join(vocab.select("token", "logp"), "token")
    else:
        vocab = vocab.localCheckpoint(eager=False)  # one counting pass, two consumers
        head = vocab.orderBy(F.col("n").desc(), F.col("token")).limit(head_k).select("token", "logp")
        # left_anti against the SAME head set keeps the split exact
        tail = vocab.join(F.broadcast(head.select("token")), "token", "left_anti").select("token", "logp")
        scored = toks.join(F.broadcast(head), "token").unionByName(toks.join(tail, "token"))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum("logp").cast("decimal(20,6)").cast("double").alias("sum_logp"),
        F.round(F.sum("logp").cast("decimal(20,6)").cast("double") / F.count(F.lit(1)), 6).alias("avg_logp"),
    )


def positioned_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, token): whitespace tokens with their 0-based position
    (the order key for n-gram context). Empty documents emit nothing."""
    return (
        df.select(F.col(id_col), F.posexplode(F.split(norm_text(text_col), " ")).alias("pos", "token"))
        .filter(F.col("token") != "")
    )


def doc_bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 2,
    backoff: float = 0.4,
) -> DataFrame:
    """Per-document bigram language-model score with stupid backoff
    (Brants et al., "Large Language Models in Machine Translation",
    EMNLP 2007): token i scores

      - ln(c(w_{i-1}, w_i) / c(w_{i-1}))      if the bigram survives
        pruning (corpus count ≥ ``min_count``),
      - ln(backoff · c(w_i) / T)              otherwise (backed-off,
        discounted unigram),
      - ln(c(w_i) / T)                        for the first token.

    Returns (id, n_scored, n_backoff, sum_logp, avg_logp). A lower
    avg_logp than the unigram model on the same doc means its local
    word order is unusual for the corpus — a sharper fluency/quality
    signal than bag-of-words perplexity.

    Determinism: per-token log-probs are rounded to 6 decimals and cast
    DECIMAL(18,6) before the per-doc sum (module contract). Scale: the
    pruned bigram table is the only wide artifact; both scoring joins
    are token-keyed equi-joins, and the ``lag`` window partitions by
    document — state bounded by the longest doc, never the corpus.
    """
    toks = positioned_tokens(df, id_col, text_col).localCheckpoint(eager=False)
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
    total = uni.select(F.sum("c1").alias("__t"))
    unil = uni.crossJoin(F.broadcast(total)).select(
        "token",
        "c1",
        F.round(F.log(F.col("c1").cast("double") / F.col("__t")), 6).cast("decimal(18,6)").alias("lp_uni"),
        F.round(F.log(F.lit(backoff) * F.col("c1") / F.col("__t")), 6).cast("decimal(18,6)").alias("lp_back"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = toks.withColumn("prev", F.lag("token").over(w))
    big = (
        pairs.filter(F.col("prev").isNotNull())
        .groupBy("prev", "token")
        .agg(F.count(F.lit(1)).alias("c2"))
        .filter(F.col("c2") >= min_count)
    )
    bigl = big.join(uni.select(F.col("token").alias("prev"), "c1"), "prev").select(
        "prev",
        "token",
        F.round(F.log(F.col("c2").cast("double") / F.col("c1")), 6).cast("decimal(18,6)").alias("lp_big"),
    )
    scored = (
        pairs.join(unil.select("token", "lp_uni", "lp_back"), "token")
        .join(bigl, ["prev", "token"], "left")
        .select(
            F.col(id_col),
            F.when(F.col("prev").isNull(), F.col("lp_uni"))
            .when(F.col("lp_big").isNotNull(), F.col("lp_big"))
            .otherwise(F.col("lp_back"))
            .alias("lp"),
            F.when(F.col("prev").isNotNull() & F.col("lp_big").isNull(), 1).otherwise(0).alias("__back"),
        )
    )
    from lakehouse_spark_spark.operators.stats import decimal_avg6

    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.count(F.when(F.col("__back") == 1, 1)).alias("n_backoff"),
        F.sum("lp").cast("decimal(20,6)").cast("double").alias("sum_logp"),
        decimal_avg6(F.sum("lp").cast("decimal(20,6)"), F.count(F.lit(1))).alias("avg_logp"),
    )


def doc_trigram_logprob_interp(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 2,
    l3: float = 0.6,
    l2: float = 0.3,
    l1: float = 0.1,
) -> DataFrame:
    """Per-document INTERPOLATED trigram LM score (Jelinek–Mercer):
    each token ≥ position 2 scores

        ln(λ3·p3 + λ2·p2 + λ1·p1)

    with p3 = c(w₋₂w₋₁w)/c(w₋₂w₋₁) (0 when the trigram or its context
    is pruned below ``min_count``), p2 = c(w₋₁w)/c(w₋₁), p1 = c(w)/T.
    The first two tokens score the lower orders available to them
    (unigram; then bigram+unigram reweighted to λ2+λ3, λ1).

    Returns (id, n_scored, sum_logp, avg_logp). Interpolation never
    hits ln(0) (p1 > 0 always), so no backoff discount is needed —
    this is the smoother, standard alternative to stupid backoff
    (``doc_bigram_logprob``).

    Determinism: the interpolated probability is assembled from exact
    integer count ratios in ONE double expression (identical operator
    tree in the oracle), then rounded to 6 decimals and cast decimal
    before the per-doc sum. Scale: three count tables (uni/bi/tri),
    all map-side-combined groupBys; scoring is three token-keyed
    equi-joins; the lag window partitions per document.
    """
    from lakehouse_spark_spark.operators.stats import decimal_avg6

    toks = positioned_tokens(df, id_col, text_col).localCheckpoint(eager=False)
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
    total = uni.select(F.sum("c1").alias("__t"))
    w = Window.partitionBy(id_col).orderBy("pos")
    ctx = toks.withColumn("p1", F.lag("token", 1).over(w)).withColumn("p2", F.lag("token", 2).over(w))
    big = (
        ctx.filter(F.col("p1").isNotNull())
        .groupBy(F.col("p1").alias("w1"), F.col("token").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c2"))
        .filter(F.col("c2") >= min_count)
    )
    tri = (
        ctx.filter(F.col("p2").isNotNull())
        .groupBy(F.col("p2").alias("w1"), F.col("p1").alias("w2"), F.col("token").alias("w3"))
        .agg(F.count(F.lit(1)).alias("c3"))
        .filter(F.col("c3") >= min_count)
    )
    # context counts come from the unigram/bigram tables directly so the
    # ratios are true conditional frequencies:
    uni1 = uni.select(F.col("token").alias("w1"), F.col("c1").alias("c_ctx1"))
    big2 = big.select(F.col("w1").alias("b1"), F.col("w2").alias("b2"), "c2")
    scored = (
        ctx.join(uni.select("token", "c1").crossJoin(F.broadcast(total)), "token")
        .join(uni1, ctx["p1"] == uni1["w1"], "left")
        .join(
            big2,
            (ctx["p1"] == big2["b1"]) & (ctx["token"] == big2["b2"]),
            "left",
        )
        .join(
            big.select(F.col("w1").alias("g1"), F.col("w2").alias("g2"), F.col("c2").alias("c_ctx2")),
            (ctx["p2"] == F.col("g1")) & (ctx["p1"] == F.col("g2")),
            "left",
        )
        .join(
            tri.select(F.col("w1").alias("t1"), F.col("w2").alias("t2"), F.col("w3").alias("t3"), "c3"),
            (ctx["p2"] == F.col("t1")) & (ctx["p1"] == F.col("t2")) & (ctx["token"] == F.col("t3")),
            "left",
        )
    )
    p1_ = F.col("c1").cast("double") / F.col("__t")
    p2_ = F.when(
        F.col("c_ctx1").isNotNull() & F.col("c2").isNotNull(),
        F.col("c2").cast("double") / F.col("c_ctx1"),
    ).otherwise(F.lit(0.0))
    p3_ = F.when(
        F.col("c_ctx2").isNotNull() & F.col("c3").isNotNull(),
        F.col("c3").cast("double") / F.col("c_ctx2"),
    ).otherwise(F.lit(0.0))
    lp = (
        F.when(F.col("p1").isNull(), F.log(p1_))  # first token: unigram
        .when(F.col("p2").isNull(), F.log(F.lit(l3 + l2) * p2_ + F.lit(l1) * p1_))  # second: bi+uni
        .otherwise(F.log(F.lit(l3) * p3_ + F.lit(l2) * p2_ + F.lit(l1) * p1_))
    )
    per_tok = scored.select(F.col(id_col).alias("__id"), F.round(lp, 6).cast("decimal(18,6)").alias("lp"))
    return per_tok.groupBy(F.col("__id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum("lp").cast("decimal(20,6)").cast("double").alias("sum_logp"),
        decimal_avg6(F.sum("lp").cast("decimal(20,6)"), F.count(F.lit(1))).alias("avg_logp"),
    )
