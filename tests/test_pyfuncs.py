"""Scalar Pandas UDF and UDTF: equivalence with built-ins + the measured
cost of leaving the JVM."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_pandas_udf_matches_native_token_count(spark):
    from lakehouse_spark_spark.operators import text as tx
    from lakehouse_spark_spark.operators.pyfuncs import token_counts_vectorized
    from lakehouse_spark_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    native = {r["doc_id"]: r["n"] for r in docs.select("doc_id", tx.n_tokens("text").cast("long").alias("n")).collect()}
    viaudf = {r["doc_id"]: r["n_tokens"] for r in token_counts_vectorized(docs).collect()}
    assert native == viaudf


def test_native_beats_pandas_udf(spark):
    """The SCALE.md claim, measured: the built-in expression should not
    lose to the Arrow-batched UDF (both are fast at this size; the
    assertion guards against the native path regressing into something
    slower than Python)."""
    from lakehouse_spark_spark.operators import text as tx
    from lakehouse_spark_spark.operators.pyfuncs import token_counts_vectorized
    from lakehouse_spark_spark.sources.loaders import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").cache()
    docs.count()
    t0 = time.perf_counter()
    for _ in range(3):
        docs.select(tx.n_tokens("text").alias("n")).agg(F.sum("n")).collect()
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        token_counts_vectorized(docs).agg(F.sum("n_tokens")).collect()
    t_udf = time.perf_counter() - t0
    docs.unpersist()
    assert t_native < t_udf * 3  # generous: native must be in the same class or better


def test_udtf_sentence_split(spark):
    from lakehouse_spark_spark.operators.pyfuncs import explode_sentences

    docs = spark.createDataFrame(
        [(1, "First sentence. Second one! Third?"), (2, "No terminator here"), (3, None)],
        ["doc_id", "text"],
    )
    out = explode_sentences(spark, docs)
    rows = {(r["doc_id"], r["sentence_idx"]): r["sentence"] for r in out.collect()}
    assert rows[(1, 0)] == "First sentence"
    assert rows[(1, 1)] == "Second one"
    assert rows[(1, 2)] == "Third"
    assert rows[(2, 0)] == "No terminator here"
    assert not any(k[0] == 3 for k in rows)  # null text -> no rows


def test_udtf_strip_matches_regex_ws_class_not_python_strip(spark):
    """The \\x1f-class divergence (r7 ADVICE): Python str.strip() eats
    C0 controls and \\xa0 that regex \\s does not. SplitSentences must
    trim exactly the \\s set so the DuckDB oracle (RE2 \\s trims) stays
    hash-exact on a control-bearing corpus."""
    import duckdb

    from lakehouse_spark_spark.operators.pyfuncs import explode_sentences

    texts = [
        (1, "keep\x1f. \x1ftail"),     # \x1f at both segment edges
        (2, "\x1f."),                   # segment that is ONLY \x1f
        (3, "a\xa0. b\x85c!"),         # NBSP / NEL edges
        (4, " spaced . normal ! "),
        (5, "a\x0b. \x0bb! \x0b."),    # \v: STRIPPED (in _WS and the
                                        # oracle's explicit class, but
                                        # NOT in RE2 \s — r8 review fix)
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    out = explode_sentences(spark, docs)
    got = {(r["doc_id"], r["sentence_idx"]): r["sentence"] for r in out.collect()}
    # \s does not include \x1f/\xa0/\x85: they survive at edges
    assert got[(1, 0)] == "keep\x1f"
    assert got[(1, 1)] == "\x1ftail"
    assert got[(2, 0)] == "\x1f"      # non-empty under \s-trim semantics
    assert got[(3, 0)] == "a\xa0"
    assert got[(3, 1)] == "b\x85c"
    assert got[(4, 0)] == "spaced"
    # \v IS trimmed on both sides, and a \v-only segment drops
    assert got[(5, 0)] == "a"
    assert got[(5, 1)] == "b"
    assert (5, 2) not in got
    # and the REGISTERED DuckDB oracle's trim agrees row-for-row (use
    # the registry string itself, not a copy that could drift)
    from lakehouse_spark_spark.plans.queries import registry

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", texts)
    oracle = con.execute(registry()["doc_sentences_udtf"].oracle).fetchall()
    assert {(d, i): s for d, s, i in oracle} == got
