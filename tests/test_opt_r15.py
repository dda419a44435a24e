"""Round-15 optimization seams: the refactors that changed operator
INTERNALS (not outputs) each get a focused equivalence pin here.

1. text.py expression builders (`gopher_quality_cols` /
   `gopher_line_cols` / `blocklist_cols`) — the fused-projection form
   the curation chain now uses must equal the df-level operators
   column for column.
2. similarity._pq_codebooks_np — the driver-direct codebook path
   train_ivfpq now takes must be bit-identical to the DataFrame entry
   (train_pq_codebooks) on the same sample.
3. graph.connected_components fused relax — identical labels to a
   driver union-find on graphs that exercise round-1 fast path, the
   union-relax, and multi-round pointer jumping.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_ORACLE = "/root/testdata/sf0.01"


def _docs(spark):
    from lakehouse_spark_spark.sources.loaders import load_table

    return load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", "lang", "source", "text"
    )


def test_gate_cols_equal_df_operators(spark):
    from lakehouse_spark_spark.operators.text import (
        blocklist_cols,
        blocklist_flags,
        gopher_line_cols,
        gopher_line_flags,
        gopher_quality_cols,
        gopher_quality_flags,
    )

    docs = _docs(spark)
    terms, phrases = ["gibberish"], ["merge merge"]

    word = gopher_quality_cols("text", min_words=20, max_words=1000, stopword_min=1)
    line = gopher_line_cols("text")
    blk = blocklist_cols("text", terms, phrases)
    fused = docs.select(
        "doc_id",
        *[word[k].alias(f"w_{k}") for k in word],
        *[line[k].alias(f"l_{k}") for k in line],
        *[blk[k].alias(f"b_{k}") for k in blk],
    )

    wf = gopher_quality_flags(docs, "doc_id", "text", min_words=20, max_words=1000, stopword_min=1)
    lf = gopher_line_flags(docs, "doc_id", "text")
    bf = blocklist_flags(docs, "doc_id", "text", terms, phrases)
    joined = (
        wf.select("doc_id", *[F.col(c).alias(f"w_{c}") for c in wf.columns if c != "doc_id"])
        .join(lf.select("doc_id", *[F.col(c).alias(f"l_{c}") for c in lf.columns if c != "doc_id"]), "doc_id")
        .join(bf.select("doc_id", *[F.col(c).alias(f"b_{c}") for c in bf.columns if c != "doc_id"]), "doc_id")
    )

    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, joined.select(*fused.columns).collect()))
    assert a == b
    # the df-level wrappers kept their exact column order (API contract)
    assert wf.columns == [
        "doc_id", "n_words", "sum_word_len", "n_alpha_words", "n_symbols",
        "stopword_hits", "word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
        "alpha_ok", "stopword_ok", "keep",
    ]
    assert lf.columns == [
        "doc_id", "n_lines", "n_bullet_lines", "n_ellipsis_lines",
        "bullet_ok", "ellipsis_ok", "keep",
    ]
    assert bf.columns == ["doc_id", "n_blocked_terms", "has_blocked_phrase", "blocked"]


def test_pq_codebooks_np_bit_identical_to_dataframe_entry(spark):
    import numpy as np

    from lakehouse_spark_spark.operators.similarity import (
        _pq_codebooks_np,
        train_pq_codebooks,
    )
    from lakehouse_spark_spark.sources.loaders import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").select("embedding").limit(64)
    via_df = train_pq_codebooks(emb, "embedding", m=4, k=8, max_train_rows=64, iters=5)
    X = np.asarray(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    direct = _pq_codebooks_np(X, m=4, k=8, iters=5)
    assert via_df == direct  # floats compared exactly: same op order, bit-identical


def test_cc_fused_relax_matches_union_find(spark):
    from lakehouse_spark_spark.operators.graph import connected_components

    # chain (multi-round pointer jumping), star, pair, isolated-cluster
    edges = [
        (10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (15, 16), (16, 17),
        (30, 31), (30, 32), (30, 33),
        (50, 51),
        (70, 71), (71, 72), (70, 72),
    ]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        (r["node"], r["component"])
        for r in connected_components(df, "a", "b").collect()
    }
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    want = {(n, find(n)) for n in nodes}
    assert got == want
