"""Deterministic PageRank: known-graph values and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_pagerank_star_graph(spark):
    """Star a->c, b->c, c->a: c concentrates rank; a feeds from c; b
    (no in-edges) stays at the base. Compare against hand-iterated
    values of the same rounded recurrence."""
    from lakehouse_spark_spark.operators.graph import pagerank

    e = _edges(spark, [(1, 3), (2, 3), (3, 1)])
    got = {r["node"]: float(r["rank"]) for r in pagerank(e, iterations=5).collect()}

    # reference: pure-Python replay of the identical INTEGER recurrence
    # (BIGINT units of 1e-9; half_up(R*17/(20*deg)) = (34R+20deg)//(40deg))
    nodes = {1, 2, 3}
    deg = {1: 1, 2: 1, 3: 1}
    unit = 10**9
    rank = {n: unit for n in nodes}
    for _ in range(5):
        contrib = {n: 0 for n in nodes}
        for s, d in [(1, 3), (2, 3), (3, 1)]:
            contrib[d] += (34 * rank[s] + 20 * deg[s]) // (40 * deg[s])
        rank = {n: 150_000_000 + contrib[n] for n in nodes}
    for n in nodes:
        assert got[n] == pytest.approx(rank[n] / unit, abs=1e-12), (n, got[n], rank[n] / unit)
    assert got[3] > got[1] > got[2]


def test_pagerank_dangling_receives_rank(spark):
    from lakehouse_spark_spark.operators.graph import pagerank

    e = _edges(spark, [(1, 2), (3, 2)])
    got = {r["node"]: float(r["rank"]) for r in pagerank(e, iterations=3).collect()}
    # 2 is a dangling sink: receives from both, emits nothing
    assert got[2] > got[1] == got[3]


def test_pagerank_rank_mass_sane(spark):
    """N-normalized ranks: every rank >= 1-d, and the total cannot
    exceed N (mass only leaks via dangling nodes, never grows)."""
    from lakehouse_spark_spark.operators.graph import pagerank

    e = _edges(spark, [(i, (i + 1) % 6) for i in range(6)])  # 6-cycle
    ranks = pagerank(e, iterations=8)
    rows = ranks.collect()
    assert all(float(r["rank"]) >= 0.15 for r in rows)
    total = ranks.agg(F.sum(F.col("rank").cast("double"))).collect()[0][0]
    assert total <= 6.0 + 1e-6
    # a cycle is symmetric: every node converges to exactly 1
    for r in rows:
        assert float(r["rank"]) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_zero_iterations_returns_init_rank(spark):
    """r15 loop restructure: the full node->rank reconstruction moved
    out of the loop; iterations=0 must still return every node at the
    N-normalized init rank 1."""
    from lakehouse_spark_spark.operators.graph import pagerank

    e = _edges(spark, [(1, 2), (3, 2)])
    got = {r["node"]: float(r["rank"]) for r in pagerank(e, iterations=0).collect()}
    assert got == {1: 1.0, 2: 1.0, 3: 1.0}
