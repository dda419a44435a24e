"""In-engine learned quality classifier: distributed logistic
regression over hashed bag-of-words features.

The missing learned-filter stage of the LLM-data curation pipeline:
rule-based gates (operators/text.py Gopher word/line rules) are the
WEAK LABELS, and a linear classifier is distilled from them and then
applied corpus-wide — the FineWeb/DCLM-style "train a small quality
classifier, filter at scale" shape, expressed entirely in DataFrame
operations.

Scale design (the part that matters at 100 TB):

- The MODEL is tiny and driver-resident: ``dim`` weights + bias
  (default 1024 doubles). Every epoch collects exactly one
  dim-bounded gradient vector — never rows, never features per doc.
- The DATA never leaves executors: each epoch is one pass over the
  hashed-feature frame — a broadcast hash join against the dim-row
  weight table (a few KB), a per-doc logit groupBy, and a per-feature
  gradient groupBy. Two key-partitioned shuffles per epoch, both
  map-side combinable.
- Feature hashing uses the repo's cross-engine md5 pattern
  (conv(substr(md5(token),1,15),16,10) % dim), so the feature map is
  deterministic and reimplementable in any engine (the pure-Python
  twin in tests/test_classifier.py re-derives it bit-for-bit).
- Full-batch gradient descent with a fixed epoch count: iteration is
  driver-side CONTROL only (like operators/graph.py and bpe.py); the
  per-epoch lineage starts from the (cached) feature frame, so no
  lineage growth and nothing to checkpoint.
- Distillation trains on a corpus-size-independent SAMPLE, so the
  default registry path collects that bounded sample's sparse feature
  rows once and runs the epochs in numpy (``collect_cap`` — the PQ
  codebook-training contract); the distributed loop is the fallback
  for label sets beyond driver bounds.

Float caveat: distributed double sums are ordering-dependent, so
trained weights are reproducible only to ~1e-12 relative — the twin
test compares with tolerance, and the registry query is rows-only (the
same class as BPE/WordPiece: iterative, data-dependent, twin-proven).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok): the SHARED tokenization for training features and
    scoring — one definition so the two can never drift apart (a model
    trained in one feature space and scored in another fails silently)."""
    from lakehouse_spark_spark.operators.text import norm_text

    return docs.select(
        F.col(id_col),
        F.explode(F.split(norm_text(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")


def _fidx(dim: int):
    """The SHARED token -> feature-index hash (cross-engine md5
    pattern), over the ``tok`` column."""
    return (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long") % dim
    ).alias("fidx")


def hashed_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    with_stats: bool = False,
) -> DataFrame:
    """Hashed bag-of-words: one row per (doc, feature index) with the
    doc-relative token frequency as the value.

    Tokens are the whitespace words of the normalized text
    (operators.text.norm_text); each token hashes to
    ``conv(substr(md5(token),1,15),16,10) % dim``. Values are
    tf = count(token bucket)/len(doc) — length-normalized so long docs
    don't dominate the gradient. Returns ``(id_col, fidx, v)``.

    ``with_stats=True`` appends two RESERVED dense features (the model
    space becomes dim + 2): fidx=dim is log1p(token count)/10 and
    fidx=dim+1 is mean word length/10. tf vectors sum to 1 by
    construction, so length information is otherwise invisible — and
    rule-derived quality labels (Gopher) are largely length/shape
    rules; every practical quality classifier mixes stats features
    into the lexical ones for exactly this reason.
    """
    toks = _doc_tokens(docs, id_col, text_col)
    per_doc = toks.select(id_col, _fidx(dim), F.length("tok").alias("__tl")).groupBy(
        id_col, "fidx"
    ).agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.sum("__tl").cast("double").alias("chars"),
    )
    doc_len = per_doc.groupBy(id_col).agg(
        F.sum("cnt").alias("n_tok"), F.sum("chars").alias("n_chars")
    )
    bow = per_doc.join(doc_len, id_col).select(
        id_col, "fidx", (F.col("cnt") / F.col("n_tok")).alias("v")
    )
    if not with_stats:
        return bow
    stats = doc_len.select(
        id_col,
        F.array(
            F.struct(F.lit(int(dim)).alias("fidx"), (F.log1p("n_tok") / 10.0).alias("v")),
            F.struct(
                F.lit(int(dim + 1)).alias("fidx"),
                (F.col("n_chars") / F.col("n_tok") / 10.0).alias("v"),
            ),
        ).alias("__s"),
    ).select(id_col, F.explode("__s").alias("__s")).select(
        id_col, F.col("__s.fidx").alias("fidx"), F.col("__s.v").alias("v")
    )
    return bow.unionByName(stats)


def fit_stats_standardizer(feats: DataFrame, dim: int) -> dict[int, tuple[float, float]]:
    """Sample-fitted mean/std for the RESERVED dense stats features
    (fidx >= dim). Centering them puts the decision boundary near the
    origin so full-batch GD converges in ~10 epochs instead of
    oscillating; the sparse BoW block is left untouched (centering
    would densify it). Returns {fidx: (mu, sd)} — collect is bounded by
    the number of stats features (2)."""
    rows = (
        feats.filter(F.col("fidx") >= dim)
        .groupBy("fidx")
        .agg(F.avg("v").alias("mu"), F.stddev_pop("v").alias("sd"))
        .collect()
    )
    return {
        int(r["fidx"]): (float(r["mu"]), float(r["sd"]) if r["sd"] else 1.0)
        for r in rows
    }


def apply_stats_standardizer(feats: DataFrame, params: dict) -> DataFrame:
    """(v - mu)/sd for the stats features, identity for the BoW block.
    The params dict is tiny (one entry per stats feature) and rides
    along as a broadcast join."""
    if not params:
        return feats
    spark = feats.sparkSession
    pdf = spark.createDataFrame(
        [(k, mu, sd if sd else 1.0) for k, (mu, sd) in params.items()],
        "fidx long, __mu double, __sd double",
    )
    return feats.join(F.broadcast(pdf), "fidx", "left").select(
        *[c for c in feats.columns if c != "v"],
        F.when(
            F.col("__mu").isNotNull(), (F.col("v") - F.col("__mu")) / F.col("__sd")
        )
        .otherwise(F.col("v"))
        .alias("v"),
    )


def _scores(features: DataFrame, weights, bias: float, id_col: str) -> DataFrame:
    """Per-doc logit under the given model: broadcast the dim-row
    weight table (the model is dim-bounded by design), join on feature
    index, sum per doc. (An element_at lookup against an array LITERAL
    avoids the join but embeds a dim-sized literal in the plan — Janino
    recompiles it every epoch, measured strictly slower; the broadcast
    join reuses compiled shapes across epochs.) Docs with zero features
    never appear in ``features`` — callers outer-join if the bias-only
    score for empty docs matters."""
    spark = features.sparkSession
    wdf = spark.createDataFrame(
        [(int(i), float(w)) for i, w in enumerate(weights)], "fidx long, w double"
    )
    return (
        features.join(F.broadcast(wdf), "fidx")
        .groupBy(id_col)
        .agg((F.sum(F.col("v") * F.col("w")) + F.lit(float(bias))).alias("logit"))
    )


def train_logreg(
    features: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "label",
    dim: int = 1024,
    epochs: int = 8,
    lr: float = 2.0,
    collect_cap: int | None = None,
):
    """Full-batch logistic regression: returns ``(weights, bias)`` as
    (list[float] of length ``dim``, float).

    Each epoch: score every doc (broadcast-join + per-doc sum), join
    the labels, compute the per-feature gradient
    ``g_j = mean_d (sigmoid(logit_d) - y_d) * x_dj`` with ONE
    map-side-combinable groupBy, collect the <= dim+1 gradient rows,
    and update driver-side. The corpus is touched ``epochs`` times and
    collected never.

    ``collect_cap``: the bounded-sample fast path (the same contract as
    the PQ/IVF codebook training in operators/similarity.py). When the
    labeled set has at most ``collect_cap`` docs, the (<= cap * (dim+2)
    row) feature block for those docs is collected ONCE and the epochs
    run in numpy on the driver — identical full-batch semantics, zero
    Spark jobs per epoch. Distillation always trains on a
    corpus-size-independent sample, so this is the mode a 100 TB run
    uses too; the distributed loop remains for engine-generated label
    sets beyond driver bounds, and is the automatic fallback when
    ``n > collect_cap``.
    """
    if collect_cap is not None:
        # one action decides the path AND feeds the fast path: collect
        # up to cap+1 label rows — if the cap holds, these are ALL the
        # labels and the count() below is never run
        lab_rows = (
            labels.select(id_col, F.col(label_col).cast("double").alias("__y"))
            .limit(collect_cap + 1)
            .collect()
        )
        if len(lab_rows) == 0:
            return [0.0] * dim, 0.0
        # fast path requires one label row per id (the registry
        # contract); duplicated ids would drop all but one dup's
        # features from X, silently diverging from the distributed
        # loop (which counts every labeled row) — fall through to it.
        if len(lab_rows) <= collect_cap and len({r[id_col] for r in lab_rows}) == len(
            lab_rows
        ):
            return _train_logreg_collected(
                features, lab_rows, id_col, dim, epochs, lr
            )
    n = labels.count()
    if n == 0:
        return [0.0] * dim, 0.0
    # restrict the feature frame to the LABELED docs once, before the
    # loop: every epoch's _scores pass and gradient join only ever use
    # labeled rows (the right join / inner join discard the rest), so
    # without the semi-join each epoch pays a full feature-frame
    # aggregation for rows that never contribute. Numerically identical
    # (the discarded rows never entered a kept sum).
    feats = features.join(labels.select(id_col).distinct(), id_col, "semi").persist()
    lab = labels.select(
        id_col, F.col(label_col).cast("double").alias("__y")
    ).persist()
    weights = [0.0] * dim
    bias = 0.0
    try:
        for _ in range(epochs):
            err = (
                _scores(feats, weights, bias, id_col)
                .join(lab, id_col, "right")
                .select(
                    id_col,
                    (
                        F.lit(1.0)
                        / (F.lit(1.0) + F.exp(-F.coalesce(F.col("logit"), F.lit(float(bias)))))
                        - F.col("__y")
                    ).alias("__e"),
                )
            )
            # one gradient action per epoch: the bias rides along as
            # sentinel feature -1 (x_bias = 1 for every labeled doc)
            contrib = feats.join(err, id_col).select(
                "fidx", (F.col("v") * F.col("__e")).alias("c")
            ).unionByName(
                err.select(F.lit(-1).alias("fidx"), F.col("__e").alias("c"))
            )
            grad_rows = contrib.groupBy("fidx").agg(F.sum("c").alias("g")).collect()
            for r in grad_rows:
                if r["fidx"] < 0:
                    bias -= lr * float(r["g"]) / n
                else:
                    weights[int(r["fidx"])] -= lr * float(r["g"]) / n
    finally:
        feats.unpersist()
        lab.unpersist()
    return weights, bias


def train_logreg_distill(
    features: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "label",
    dim: int = 1024,
    bow_dim: int | None = None,
    epochs: int = 8,
    lr: float = 2.0,
    collect_cap: int | None = None,
):
    """Fused distillation trainer: standardizer fit + label collect +
    feature collect in ONE Spark action. Returns
    ``(weights, bias, std_params)`` where ``std_params`` is the
    ``fit_stats_standardizer``-shaped dict for the reserved stats
    features (``fidx >= bow_dim``; ``{}`` when ``bow_dim`` is None).

    ``features`` must be the RAW (unstandardized) frame — the
    standardizer is fitted and applied inside. The separate
    fit → apply → train composition runs three actions, each of which
    re-executes the bounded-sample lineage (TakeOrdered + tokenize +
    explode + two groupBys); distillation call sites are exactly that
    shape, so fusing the collects cuts the training wall-clock to one
    sample pass. Driver-side mean/std over the collected sample equals
    the Spark avg/stddev_pop fit to float-reordering tolerance (same
    contract as the GD twin, pinned by tests/test_classifier.py).

    Fast path requires ``collect_cap`` and at most ``collect_cap``
    uniquely-labeled docs; duplicated label ids or an over-cap label set
    fall back to the distributed path (Spark-fitted standardizer +
    per-epoch gradient collects). The fallback fits the standardizer
    over the LABELED docs' feature rows (a semi-join on the label ids),
    the same population the fast path fits on — so the two paths train
    the same model even when ``features`` covers more docs than
    ``labels``.
    """
    if collect_cap is not None:
        from pyspark.sql import Window

        lab = labels.select(
            id_col, F.col(label_col).cast("double").alias("__y")
        ).limit(collect_cap + 1)
        # dup guard rides along in the same action: a duplicated label
        # id would silently diverge from the distributed loop (which
        # counts every labeled row) — detect and fall back.
        lab = lab.withColumn(
            "__nl", F.count(F.lit(1)).over(Window.partitionBy(id_col))
        )
        rows = (
            lab.join(features, id_col, "left")
            .select(id_col, "__y", "__nl", "fidx", "v")
            .collect()
        )
        if not rows:
            return [0.0] * dim, 0.0, {}
        dup = any(r["__nl"] > 1 for r in rows)
        y_of: dict = {}
        for r in rows:
            y_of.setdefault(r[id_col], r["__y"])
        if not dup and len(y_of) <= collect_cap:
            return _train_distill_rows(rows, y_of, id_col, dim, bow_dim, epochs, lr)
    lab_feats = features.join(labels.select(id_col).distinct(), id_col, "semi")
    std = fit_stats_standardizer(lab_feats, bow_dim) if bow_dim is not None else {}
    w, b = train_logreg(
        apply_stats_standardizer(lab_feats, std),
        labels,
        id_col,
        label_col,
        dim=dim,
        epochs=epochs,
        lr=lr,
    )
    return w, b, std


def _train_distill_rows(
    rows: list,
    y_of: dict,
    id_col: str,
    dim: int,
    bow_dim: int | None,
    epochs: int,
    lr: float,
):
    """Driver-side half of ``train_logreg_distill``: fit the stats
    standardizer over the collected sample rows (population std, docs
    WITH the feature only — the Spark fit aggregates rows, not docs, so
    absent features contribute nothing there either), standardize while
    filling X, then numpy full-batch GD."""
    import numpy as np

    ids = list(y_of)
    row_of = {i: j for j, i in enumerate(ids)}
    y = np.array([y_of[i] for i in ids])
    n = len(ids)
    std: dict[int, tuple[float, float]] = {}
    if bow_dim is not None:
        vals: dict[int, list] = {}
        for r in rows:
            if r["fidx"] is not None and int(r["fidx"]) >= bow_dim:
                vals.setdefault(int(r["fidx"]), []).append(r["v"])
        for j, vs in vals.items():
            a = np.array(vs)
            sd = float(a.std())
            std[j] = (float(a.mean()), sd if sd else 1.0)
    X = np.zeros((n, dim))
    for r in rows:
        if r["fidx"] is None:
            continue
        j = int(r["fidx"])
        v = r["v"]
        if j in std:
            mu, sd = std[j]
            v = (v - mu) / sd
        X[row_of[r[id_col]], j] = v
    w = np.zeros(dim)
    b = 0.0
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        e = p - y
        w -= lr * (X.T @ e) / n
        b -= lr * e.sum() / n
    return [float(v) for v in w], float(b), std


def _train_logreg_collected(
    features: DataFrame,
    lab_rows: list,
    id_col: str,
    dim: int,
    epochs: int,
    lr: float,
):
    """Driver-side twin of the distributed loop for a bounded labeled
    sample (``lab_rows``: pre-collected ``(id, __y)`` rows): one
    semi-filtered collect of the sample's sparse feature rows, then
    numpy full-batch GD. Matches the distributed path to
    float-sum-reordering tolerance (~1e-9 relative, pinned by
    tests/test_classifier.py)."""
    import numpy as np

    spark = features.sparkSession
    ids = [r[id_col] for r in lab_rows]
    y = np.array([r["__y"] for r in lab_rows])
    row_of = {i: j for j, i in enumerate(ids)}
    n = len(ids)
    id_df = spark.createDataFrame([(i,) for i in ids], [id_col])
    feat_rows = (
        features.join(F.broadcast(id_df), id_col, "semi")
        .select(id_col, "fidx", "v")
        .collect()
    )
    X = np.zeros((n, dim))
    for r in feat_rows:
        X[row_of[r[id_col]], int(r["fidx"])] = r["v"]
    w = np.zeros(dim)
    b = 0.0
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        e = p - y
        w -= lr * (X.T @ e) / n
        b -= lr * e.sum() / n
    return [float(v) for v in w], float(b)


def score_documents(
    docs: DataFrame,
    weights,
    bias: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    threshold: float = 0.5,
    with_stats: bool = False,
    standardizer: dict | None = None,
) -> DataFrame:
    """Apply a trained model corpus-wide: ``(id_col, score, keep)``
    with score = sigmoid(logit). Docs with no tokens get the bias-only
    score (left join keeps every input doc). ``weights`` must cover the
    feature space hashed_features produced (dim, or dim+2 with
    ``with_stats``); pass the SAME ``standardizer`` the training
    features were transformed with.

    Scoring does NOT materialize the feature vectors: since
    tf_j = cnt_j / n_tok, the BoW logit block
    ``sum_j w_j * cnt_j / n_tok`` equals ``(sum_tokens w[h(tok)]) /
    n_tok`` — each token is weighted directly via one broadcast join
    and ONE per-doc groupBy computes sum-of-weights, token count, and
    char count together; the stats features fold in as scalar
    arithmetic on those aggregates. The hashed_features + _scores
    composition needs three key shuffles over the exploded token frame
    ((doc,fidx) groupBy, doc-length groupBy + join-back, logit groupBy)
    for the identical number — at corpus scale this pass IS the
    operator's cost. Equal to the composition up to float
    re-association (pinned by tests/test_classifier.py)."""
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(int(i), float(w)) for i, w in enumerate(weights[:dim])], "fidx long, w double"
    )
    per_doc = (
        _doc_tokens(docs, id_col, text_col)
        .select(id_col, _fidx(dim), F.length("tok").alias("__tl"))
        .join(F.broadcast(wdf), "fidx")
        .groupBy(id_col)
        .agg(
            F.sum("w").alias("__sw"),
            F.count(F.lit(1)).cast("double").alias("__n"),
            F.sum("__tl").cast("double").alias("__chars"),
        )
    )
    logit = F.col("__sw") / F.col("__n")
    if with_stats:
        std = standardizer or {}
        mu1, sd1 = std.get(dim, (0.0, 1.0))
        mu2, sd2 = std.get(dim + 1, (0.0, 1.0))
        w1 = float(weights[dim]) if len(weights) > dim else 0.0
        w2 = float(weights[dim + 1]) if len(weights) > dim + 1 else 0.0
        logit = (
            logit
            + F.lit(w1)
            * ((F.log1p("__n") / 10.0 - F.lit(float(mu1))) / F.lit(float(sd1)))
            + F.lit(w2)
            * (
                (F.col("__chars") / F.col("__n") / 10.0 - F.lit(float(mu2)))
                / F.lit(float(sd2))
            )
        )
    scored = docs.select(id_col).join(
        per_doc.select(id_col, (logit + F.lit(float(bias))).alias("logit")),
        id_col,
        "left",
    )
    p = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-F.coalesce(F.col("logit"), F.lit(float(bias))))
    )
    return scored.select(
        id_col,
        p.alias("score"),
        (p >= threshold).alias("keep"),
    )
