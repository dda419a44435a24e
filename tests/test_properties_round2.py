"""Property tests for the round-2 operator families: tokenizer
reconstruction, PageRank invariants, sketch algebra on arbitrary
groupings, z-value edge cases, snapshot retention."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORD = st.text(alphabet="abcdefg", min_size=1, max_size=10)


@settings(max_examples=50, deadline=None)
@given(word=WORD, vocab_words=st.sets(WORD, max_size=8))
def test_tokenize_word_reconstructs_or_unk(word, vocab_words):
    """For ANY word and vocab (plus the word's own alphabet): either the
    pieces reconstruct the word exactly (strip ##, concatenate) or the
    result is the single [UNK]."""
    from lakehouse_spark_spark.operators.tokenizer import UNK, tokenize_word

    vocab = set(vocab_words)
    for c in set(word):
        vocab.add(c)
        vocab.add("##" + c)
    pieces = tokenize_word(word, vocab)
    assert pieces != [UNK]  # alphabet present -> always total
    rebuilt = pieces[0] + "".join(p[2:] for p in pieces[1:])
    assert rebuilt == word
    assert all(p.startswith("##") for p in pieces[1:])
    assert not pieces[0].startswith("##")


@settings(max_examples=50, deadline=None)
@given(word=WORD)
def test_tokenize_word_unk_without_alphabet(word):
    from lakehouse_spark_spark.operators.tokenizer import UNK, tokenize_word

    assert tokenize_word(word, {"zz"}) == [UNK]


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=20,
    )
)
def test_pagerank_invariants_random_graphs(spark, edges):
    """Any digraph (self-loops and duplicates included): every node
    scores >= 1-d, total mass never exceeds N (plus the documented
    half-up rounding slack: each per-edge contrib rounds UP by at most
    0.5e-9, per iteration), result deterministic."""
    from lakehouse_spark_spark.operators.graph import pagerank

    iters = 3
    e = spark.createDataFrame(list(set(edges)), ["src", "dst"])
    got = {r["node"]: float(r["rank"]) for r in pagerank(e, iterations=iters).collect()}
    n = len({x for pair in set(edges) for x in pair})
    assert len(got) == n
    assert all(v >= 0.15 - 1e-12 for v in got.values())
    rounding_slack = 0.5e-9 * len(set(edges)) * iters
    assert sum(got.values()) <= n + rounding_slack + 1e-12
    again = {r["node"]: float(r["rank"]) for r in pagerank(e, iterations=3).collect()}
    assert got == again


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    values=st.lists(st.integers(0, 30), min_size=1, max_size=60),
    split=st.integers(1, 5),
)
def test_hll_union_invariant_any_grouping(spark, values, split):
    """Merging per-group sketches equals the direct global sketch no
    matter how rows are grouped — the algebra incremental tiers rely on."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i % split, v) for i, v in enumerate(values)], ["g", "v"])
    direct = df.agg(F.expr("hll_sketch_estimate(hll_sketch_agg(v, 12))").alias("e")).collect()[0]["e"]
    merged = (
        df.groupBy("g")
        .agg(F.expr("hll_sketch_agg(v, 12)").alias("s"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(s))").alias("e"))
        .collect()[0]["e"]
    )
    assert direct == merged


def test_zvalue_constant_and_single_row(spark):
    """Degenerate inputs: constant columns (zero span) and single rows
    must produce a valid z-value, not divide-by-zero."""
    from pyspark.sql import functions as F

    from lakehouse_spark_spark.sources.layout import zvalue

    const = spark.createDataFrame([(5, 7)] * 4, ["a", "b"])
    vals = const.select(zvalue(const, ["a", "b"], bits=4).alias("z")).collect()
    assert {r["z"] for r in vals} == {0}

    single = spark.createDataFrame([(1, 2)], ["a", "b"])
    assert single.select(zvalue(single, ["a", "b"], bits=4).alias("z")).collect()[0]["z"] is not None


def test_sketch_tier_empty_input(spark):
    from pyspark.sql import functions as F

    from lakehouse_spark_spark.operators.sketches import rollup_sketches, sketch_tier

    empty = spark.createDataFrame([], "ts timestamp, user_id long")
    tier = sketch_tier(empty, "ts", "user_id", grain="day")
    assert tier.count() == 0
    assert rollup_sketches(tier, "month").count() == 0


def test_snapshot_vacuum_keep_more_than_exists(spark):
    import shutil
    import tempfile

    from lakehouse_spark_spark.sources.snapshots import list_versions, vacuum, write_snapshot

    d = tempfile.mkdtemp(prefix="snapv_")
    try:
        write_snapshot(spark.range(2), d)
        assert vacuum(d, keep_last=5) == []
        assert list_versions(d) == [0]
    finally:
        shutil.rmtree(d, ignore_errors=True)
