"""Text-analysis operators for LLM training-data pipelines.

All pure built-in column expressions (whole-stage codegen, no Python in
the hot path): tokenization, quality scoring, token counting,
language-ID heuristic, document fingerprinting. Each has an ANSI-SQL
twin in plans/queries.py so DuckDB can oracle-check it.

Scale notes: everything here is a narrow per-row projection — no
shuffle, fully pipelined with the parquet scan, and column pruning means
only the text column is read. At 100 TB these run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/marker-frequency
# language-ID heuristic. Deterministic tie-break: the ordering below.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "que", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "在", "了", "和"],
}

# BPE-ish pre-tokenizer: letter runs | single digits | single punctuation.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

PUNCT_PATTERN = r"[^\w\s]"


def norm_text(col: Column | str) -> Column:
    """Lowercase + whitespace-collapse normalization shared by dedup,
    fingerprinting and shingling. NOTE: C0 controls (\\x00-\\x1f, \\x7f)
    that are not Java ``\\s`` survive IN-WORD here; operators whose
    internal encoding reserves such bytes (BPE uses \\x1f as its pair
    separator) must use :func:`control_safe_norm` instead — an
    INTENTIONAL divergence: word counts/vocab over a control-bearing
    corpus differ between the two normalizations."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def control_safe_norm(col: Column | str) -> Column:
    """norm_text with every C0 control byte (\\x00-\\x1f, \\x7f) mapped
    to a space FIRST, so controls become token boundaries and no token
    can ever contain \\x1f (the BPE pair-separator invariant; see
    operators/bpe.py). Any operator that reserves control bytes for
    internal encodings should normalize through THIS helper. Merge
    lists learned before round 6 (pre-control-stripping) whose symbols
    contain control characters cannot match under this normalization —
    retrain them."""
    c = F.col(col) if isinstance(col, str) else col
    return norm_text(F.regexp_replace(c, r"[\x00-\x1F\x7F]", " "))


def tokens(col: Column | str) -> Column:
    """array<string> of whitespace tokens of the normalized text."""
    return F.split(norm_text(col), " ")


def n_tokens(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Upper-bound token estimate via the BPE-ish pre-tokenizer regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(PUNCT_PATTERN), F.lit(0))).cast("double") / F.greatest(
        F.length(c), F.lit(1)
    )


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or LANG_MARKERS["en"]
    arr = F.array(*[F.lit(s) for s in sw])
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1))


def avg_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1))


def lang_score(col: Column | str, lang: str) -> Column:
    """Marker-word hit count for one language."""
    arr = F.array(*[F.lit(s) for s in LANG_MARKERS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, t)))


def lang_id(col: Column | str) -> Column:
    """argmax over language marker scores; ties resolved by the fixed
    LANG_MARKERS ordering; all-zero scores → 'und' (undetermined)."""
    scores = {lang: lang_score(col, lang) for lang in LANG_MARKERS}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # reversed so the FIRST language in the dict wins ties
    for lang in reversed(list(scores)):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def doc_fingerprint(col: Column | str, k: int = 8, stride: int = 4) -> Column:
    """Winnowing-style content fingerprint: min MD5 over k-char shingles
    sampled every ``stride`` chars of the normalized text (shorter texts
    hash whole). Robust to local edits in a way whole-document hashing
    is not; MD5 keeps it oracle-checkable (identical in DuckDB); the
    stride cuts hash work ×stride with negligible fingerprint quality
    loss (min-sampling needs coverage, not every offset)."""
    t = norm_text(col)
    positions = F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1)), F.lit(stride))
    return F.array_min(F.transform(positions, lambda i: F.md5(F.substring(t, i, k))))


def bigrams(col: Column | str) -> Column:
    """array<string> of word bigrams of the normalized text (empty for
    docs with fewer than 2 tokens)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(0)))
    return F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)))
    )


def repetition_signals(df, id_col: str, text_col: str):
    """Gopher-style within-document repetition signals over word
    bigrams: total/distinct bigram counts, duplicate-bigram fraction
    (1 - distinct/total) and top-bigram fraction (most frequent bigram's
    share). High values flag boilerplate/spam for quality filtering.

    Shape: explode → two keyed aggregations (both combiner-friendly;
    the shuffle key is (doc, bigram) then doc — no hot keys beyond
    document size, which the corpus quality gate already bounds). Docs
    with < 2 tokens have no bigrams and are excluded (no signal).
    """
    per_bigram = (
        df.select(F.col(id_col), F.explode(bigrams(text_col)).alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_bigram.groupBy(id_col).agg(
        F.sum("n").alias("n_bigrams"),
        F.count(F.lit(1)).alias("distinct_bigrams"),
        F.round(F.lit(1) - F.count(F.lit(1)) / F.sum("n"), 6).alias("dup_bigram_frac"),
        F.round(F.max("n") / F.sum("n"), 6).alias("top_bigram_frac"),
    )


def top_ngrams(df, text_col: str, k: int = 50):
    """Corpus-wide top-k bigrams by document-weighted occurrence count,
    deterministic total order (count desc, bigram asc). The groupBy
    partially aggregates map-side, so the shuffle carries one row per
    distinct bigram per partition — at 100 TB this is the standard
    vocabulary-count shape; the final top-k is a TakeOrdered, no global
    sort materialization."""
    return (
        df.select(F.explode(bigrams(text_col)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(k)
    )


def doc_chunks(df, id_col: str, text_col: str, chunk_tokens: int = 256, overlap: int = 32):
    """Split documents into fixed-size token chunks with overlap — the
    context-window packing precursor (embedding indexing, long-doc
    training): chunk i covers tokens [1 + i*(chunk-overlap), …+chunk).

    Pure array expressions + one posexplode — no shuffle, no Python;
    the chunk windows are slices of the token array computed in-row, so
    the operator runs at scan speed and parallelism follows the input
    partitioning (one doc never spans partitions, so there is no
    reassembly problem at 100 TB). The final (possibly short) chunk is
    kept; a doc shorter than one chunk yields exactly one chunk.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    # last start s.t. start <= max(n - overlap, 1): guarantees the tail
    # chunk has > overlap fresh tokens (except the single-chunk case).
    starts = F.sequence(F.lit(1), F.greatest(n - chunk_tokens + step, F.lit(1)), F.lit(step))
    chunks = F.transform(starts, lambda s: F.array_join(F.slice(toks, s, chunk_tokens), " "))
    return (
        df.filter(n >= 1)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .withColumn("chunk_tokens", F.size(F.split("chunk_text", " ")))
    )


def fast_sigmoid(z: Column) -> Column:
    """0.5 + 0.5·z/(1+|z|) — the algebraic sigmoid. Used instead of
    1/(1+exp(-z)) because it needs only +,*,/,abs, which are exactly
    IEEE-specified: the score hashes identically on any engine,
    whereas exp() is library-specific in the last ulp."""
    return F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z))


def quality_score(col: Column | str) -> Column:
    """Model-based quality score in (0,1): a fixed-weight linear
    classifier over the quality features (length, stopword density,
    punctuation density, token-length shape) squashed by fast_sigmoid —
    the engine-side stand-in for a fastText/logreg quality model
    (weights would come from training; these are hand-set to order
    documents sensibly on the synthetic corpus).

    z = -2 + 2·min(toks,500)/500 + 8·stopword_ratio
        - 6·punct_ratio - 0.4·|avg_token_len - 5|

    Every term is +,*,/,abs over exact counts — deterministic across
    engines (see fast_sigmoid)."""
    t = n_tokens(col).cast("double")
    z = (
        F.lit(-2.0)
        + F.lit(2.0) * F.least(t, F.lit(500.0)) / F.lit(500.0)
        + F.lit(8.0) * stopword_ratio(col)
        - F.lit(6.0) * punct_ratio(col)
        - F.lit(0.4) * F.abs(avg_token_len(col) - F.lit(5.0))
    )
    return fast_sigmoid(z)


def tfidf_topk_terms(docs, id_col: str, text_col: str, k: int = 3, min_term_len: int = 3):
    """Per-document top-k terms by TF-IDF: ``(id, term, tf, score, rank)``.

    Classic smoothed formulation: score = tf · (ln((N+1)/(df+1)) + 1),
    with df = number of documents containing the term. Determinism
    contract (the operators/lm.py pattern): the irrational ln is rounded
    to 6 decimals and CAST TO DECIMAL before the multiply, so scores are
    exact decimals and the (score DESC, term ASC) ranking — and its
    DuckDB-oracle twin — cannot diverge on last-ulp float noise
    (irrational values never sit on a rounding boundary; when the
    argument is exactly 1 the idf is exactly 1.0 and the score is an
    integer — also tie-free across engines).

    Scale shape: tokens explode → (doc, term) hash aggregate with
    map-side combine; df is a second aggregate over the (doc, term)
    pairs; N joins in as a broadcast scalar; the final top-k is a
    window partitioned by doc id — every shuffle keyed by doc or term,
    no global sort, no driver state.
    """
    from pyspark.sql import DataFrame, Window  # noqa: F401 — DataFrame for type context

    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).filter(F.length("term") >= min_term_len)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf6",
            F.round(
                F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0), 6
            ).cast("decimal(12,6)"),
        )
        .withColumn("score", (F.col("tf").cast("decimal(12,0)") * F.col("idf6")).cast("decimal(18,6)"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", F.col("score").cast("double").alias("score"), "rank")
    )


def blocklist_flags(
    df, id_col: str, text_col: str, blocked_terms: list[str], blocked_phrases: list[str] | None = None
):
    """C4/LDNOOBW-style blocklist filtering: flag documents containing
    any blocked TERM (exact token match on the normalized text) or
    PHRASE (substring match on the normalized text).

    (id, n_blocked_terms, has_blocked_phrase, blocked) — keep the
    complement downstream. Terms are matched via array_intersect on the
    token array (set semantics, scan-speed, no shuffle, no regex
    blowup); phrases via `contains` on the normalized string. Both
    lists ship as plan literals — at 100 TB a large blocklist becomes a
    broadcast join against exploded tokens, same result, same
    zero-shuffle scan shape.

    Blocklist entries are normalized the same way the text is
    (lowercase + whitespace collapse) — a mixed-case or multi-space
    entry would otherwise silently never match (ADVICE r3)."""

    c = blocklist_cols(text_col, blocked_terms, blocked_phrases)
    return df.select(F.col(id_col), *[c[k].alias(k) for k in c])


def blocklist_cols(
    text_col: Column | str, blocked_terms: list[str], blocked_phrases: list[str] | None = None
) -> dict[str, Column]:
    """Column-expression form of :func:`blocklist_flags`: the same
    flags as an ordered name→Column dict over any frame holding
    ``text_col``. Lets a composed pipeline FUSE the blocklist gate into
    one projection with the other per-row gates instead of computing it
    on a separate frame and joining by id (each such join is a full
    shuffle of the corpus — the fused form is zero-shuffle scan work)."""

    def _nrm(s: str) -> str:
        return " ".join(s.lower().split())

    blocked_terms = [_nrm(t) for t in blocked_terms]
    blocked_phrases = [_nrm(p) for p in (blocked_phrases or [])]
    toks = tokens(text_col)
    nrm = norm_text(text_col)
    terms = F.array(*[F.lit(t) for t in blocked_terms])
    n_terms = F.size(F.array_intersect(toks, terms))
    phrase_hit = F.lit(False)
    for p in blocked_phrases:
        phrase_hit = phrase_hit | nrm.contains(p)
    return {
        "n_blocked_terms": n_terms.cast("long"),
        "has_blocked_phrase": phrase_hit,
        "blocked": (n_terms > 0) | phrase_hit,
    }


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# Bullet prefixes for the line-based Gopher rules (Rae et al. 2021
# table A1: "90% of lines starting with a bullet point"). The two-char
# forms require a following space so a plain hyphenated word ("-foo")
# doesn't count; the glyph forms are bullets on their own.
GOPHER_BULLET_PREFIXES = ("- ", "* ", "•", "‣", "▪")
GOPHER_ELLIPSIS_SUFFIXES = ("...", "…")


def gopher_line_flags(
    df,
    id_col: str,
    text_col: str,
    max_bullet_frac: tuple[int, int] = (9, 10),
    max_ellipsis_frac: tuple[int, int] = (3, 10),
):
    """Line-based Gopher quality rules (Rae et al. 2021, "Scaling
    Language Models", table A1) — the complement of the word-level
    subset in :func:`gopher_quality_flags`:

    - fraction of lines starting with a bullet point ≤ 90%
    - fraction of lines ending with an ellipsis ("..." or "…") ≤ 30%

    Lines are ``split(text, '\\n')``, trimmed, blanks dropped. Both
    flags are decided in INTEGER arithmetic (frac ≤ p/q ⇔
    q·n_hit ≤ p·n_lines), so no float ratio ever materializes and the
    row is bit-stable across engines. A document with zero non-blank
    lines passes both rules (0 ≤ 0).

    Scale: pure per-row projections over the line array — zero
    shuffles, scan speed, like the rest of this module.
    """
    c = gopher_line_cols(text_col, max_bullet_frac, max_ellipsis_frac)
    return df.select(F.col(id_col), *[c[k].alias(k) for k in c])


def gopher_line_cols(
    text_col: Column | str,
    max_bullet_frac: tuple[int, int] = (9, 10),
    max_ellipsis_frac: tuple[int, int] = (3, 10),
) -> dict[str, Column]:
    """Column-expression form of :func:`gopher_line_flags` (same
    fuse-into-one-projection rationale as :func:`blocklist_cols`)."""
    bp, bq = max_bullet_frac
    ep, eq = max_ellipsis_frac
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )

    def _starts_bullet(l):
        cond = F.lit(False)
        for p in GOPHER_BULLET_PREFIXES:
            cond = cond | l.startswith(p)
        return cond

    def _ends_ellipsis(l):
        cond = F.lit(False)
        for s in GOPHER_ELLIPSIS_SUFFIXES:
            cond = cond | l.endswith(s)
        return cond

    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(F.filter(lines, _starts_bullet)).cast("long")
    n_ellipsis = F.size(F.filter(lines, _ends_ellipsis)).cast("long")
    bullet_ok = F.lit(bq) * n_bullet <= F.lit(bp) * n_lines
    ellipsis_ok = F.lit(eq) * n_ellipsis <= F.lit(ep) * n_lines
    return {
        "n_lines": n_lines,
        "n_bullet_lines": n_bullet,
        "n_ellipsis_lines": n_ellipsis,
        "bullet_ok": bullet_ok,
        "ellipsis_ok": ellipsis_ok,
        "keep": bullet_ok & ellipsis_ok,
    }


def gopher_quality_flags(
    df,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    stopword_min: int = 2,
):
    """Gopher quality-filter rules (Rae et al. 2021, "Scaling Language
    Models", table A1) — the word-level subset, as pure projections:

    - word count in [min_words, max_words]
    - mean word length in [3, 10] chars
    - symbol-to-word ratio ('#' or '...') < 0.1
    - > 80% of words contain an alphabetic character
    - at least ``stopword_min`` (default 2) of the 8 Gopher stopwords

    Every flag is decided in INTEGER arithmetic (e.g. mean-word-length
    in [3,10] ⇔ 3·n ≤ Σlen ≤ 10·n), so the output is bit-stable across
    engines — no float ratio ever materializes. The line-based Gopher
    rules (bullet-start / ellipsis-end line fractions) need a
    line-structured corpus; over one, they are the same projections on
    ``split(text, '\\n')``.

    Scale: zero shuffles — flags at scan speed, like the rest of this
    module. Emits the integer evidence columns too, so downstream
    thresholds can be re-derived without re-scanning.
    """
    c = gopher_quality_cols(text_col, min_words, max_words, stopword_min)
    return df.select(F.col(id_col), *[c[k].alias(k) for k in c])


def gopher_quality_cols(
    text_col: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    stopword_min: int = 2,
) -> dict[str, Column]:
    """Column-expression form of :func:`gopher_quality_flags` (same
    fuse-into-one-projection rationale as :func:`blocklist_cols`)."""
    nrm = norm_text(text_col)
    ws = tokens(text_col)
    n = F.size(ws)
    # single-spaced normalized text: Σ word length = len - (n-1) spaces
    sum_len = (F.length(nrm) - (n - F.lit(1))).cast("long")
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[a-z]"))).cast("long")
    hashes = F.length(nrm) - F.length(F.replace(nrm, F.lit("#"), F.lit("")))
    ellipses = (
        (F.length(nrm) - F.length(F.replace(nrm, F.lit("..."), F.lit("")))) / F.lit(3)
    ).cast("long")
    n_symbols = (hashes + ellipses).cast("long")
    stop_hits = F.size(
        F.array_intersect(ws, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    ).cast("long")

    n_l = n.cast("long")
    word_count_ok = (n_l >= min_words) & (n_l <= max_words)
    mean_word_len_ok = (F.lit(3) * n_l <= sum_len) & (sum_len <= F.lit(10) * n_l)
    symbol_ratio_ok = F.lit(10) * n_symbols < n_l
    alpha_ok = F.lit(5) * n_alpha > F.lit(4) * n_l
    stopword_ok = stop_hits >= stopword_min
    return {
        "n_words": n_l,
        "sum_word_len": sum_len,
        "n_alpha_words": n_alpha,
        "n_symbols": n_symbols,
        "stopword_hits": stop_hits,
        "word_count_ok": word_count_ok,
        "mean_word_len_ok": mean_word_len_ok,
        "symbol_ratio_ok": symbol_ratio_ok,
        "alpha_ok": alpha_ok,
        "stopword_ok": stopword_ok,
        "keep": word_count_ok & mean_word_len_ok & symbol_ratio_ok & alpha_ok & stopword_ok,
    }
