"""Connected components (operators/graph.py): hand graphs + randomized
equivalence against a pure-Python union-find reference."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from lakehouse_spark_spark.operators.graph import (
    cluster_representatives,
    components_with_singletons,
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df).collect()
    return {r["node"]: r["component"] for r in got}


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min member per component
    comp = {}
    members = {}
    for x in parent:
        members.setdefault(find(x), []).append(x)
    for root, ms in members.items():
        m = min(ms)
        for x in ms:
            comp[x] = m
    return comp


def test_cc_chain_star_isolated(spark):
    # chain 1-2-3-4, star 10-{11,12,13}, pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


def test_cc_long_chain_converges_via_pointer_jumping(spark):
    # diameter 40 chain must converge well inside max_iter=25 rounds
    edges = [(i, i + 1) for i in range(40)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for _ in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(50)]
        edges = [(a, b) for a, b in edges if a != b]
        assert _cc(spark, edges) == _union_find(edges)


def test_singletons_and_representatives(spark):
    edges_df = spark.createDataFrame([(5, 9)], "src long, dst long")
    comp = connected_components(edges_df)
    universe = spark.createDataFrame([(5,), (9,), (42,)], "doc_id long")
    full = components_with_singletons(universe, comp, "doc_id")
    got = {r["doc_id"]: r["component"] for r in full.collect()}
    assert got == {5: 5, 9: 5, 42: 42}

    reps = cluster_representatives(comp).collect()
    by_node = {r["node"]: r["is_representative"] for r in reps}
    assert by_node == {5: True, 9: False}


class TestTriangleCounts:
    def test_known_graph(self, spark):
        """K4 on {1,2,3,4} (4 triangles, each vertex in 3) plus a
        pendant chain 4-5-6 (no triangles) plus an isolated edge 7-8:
        per-vertex counts and degrees are fully determined."""
        from lakehouse_spark_spark.operators.graph import triangle_counts

        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6), (7, 8)],
            "id_a BIGINT, id_b BIGINT",
        )
        got = {
            r["doc_id"]: (r["tri_count"], r["degree"])
            for r in triangle_counts(edges, "id_a", "id_b").collect()
        }
        assert got == {1: (3, 3), 2: (3, 3), 3: (3, 3), 4: (3, 4)}

    def test_orientation_invariant_to_input_endpoint_order(self, spark):
        """The input edge list is undirected: flipping endpoint order
        must not change the result (the orientation is derived from
        (degree, id), not from the input column positions)."""
        from lakehouse_spark_spark.operators.graph import triangle_counts

        fwd = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4), (1, 4)], "id_a BIGINT, id_b BIGINT"
        )
        rev = fwd.select(
            fwd["id_b"].alias("id_a"), fwd["id_a"].alias("id_b")
        )
        key = lambda df: sorted(map(tuple, triangle_counts(df, "id_a", "id_b").collect()))
        assert key(fwd) == key(rev)

    def test_hub_graph_no_last_reducer_curse(self, spark):
        """Star K1,n (n=20000) + 3 leaf-leaf edges. A naive per-vertex
        neighbourhood join enumerates ~n² = 4·10⁸ wedge pairs at the
        hub; under degree orientation the hub (highest degree) has
        out-degree ZERO, so the wedge join emits only the leaves'
        wedges (out-degree ≤ 3 here). Every leaf-leaf edge closes a
        triangle through the hub: expect 3 hub triangles + 1 pure-leaf
        triangle, and the run completes in seconds, not the 4·10⁸-row
        join the curse-of-the-last-reducer shape would produce."""
        from pyspark.sql import functions as F

        from lakehouse_spark_spark.operators.graph import triangle_counts

        n = 20000
        star = spark.range(1, n + 1).select(
            F.lit(0).cast("bigint").alias("id_a"), F.col("id").alias("id_b")
        )
        extra = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3)], "id_a BIGINT, id_b BIGINT"
        )
        out = {
            r["doc_id"]: (r["tri_count"], r["degree"])
            for r in triangle_counts(star.unionByName(extra), "id_a", "id_b").collect()
        }
        # hub: in 3 triangles (one per leaf-leaf edge), degree n
        assert out[0] == (3, n)
        # each wired leaf: 2 hub triangles + the leaf triangle, degree 3
        assert out[1] == (3, 3) and out[2] == (3, 3) and out[3] == (3, 3)
        # nobody else participates
        assert set(out) == {0, 1, 2, 3}


def test_cc_dedup_edges_false_identical_even_with_duplicate_edges(spark):
    """r15 optimization knob: dedup_edges=False skips the sym distinct
    (one shuffle saved per call). Edge MULTIPLICITY must never change
    the fixpoint — asserted on random graphs with deliberately
    duplicated and both-orientation edges."""
    rng = random.Random(15)
    for trial in range(3):
        n = 40
        base = [(rng.randrange(n), rng.randrange(n)) for _ in range(35)]
        base = [(a, b) for a, b in base if a != b]
        # duplicate some edges, flip some orientations
        noisy = base + base[::3] + [(b, a) for a, b in base[::4]]
        df_noisy = spark.createDataFrame(noisy, "src long, dst long")
        df_base = spark.createDataFrame(base, "src long, dst long")
        got_nodedup = {
            r["node"]: r["component"]
            for r in connected_components(df_noisy, dedup_edges=False).collect()
        }
        got_dedup = {
            r["node"]: r["component"]
            for r in connected_components(df_base, dedup_edges=True).collect()
        }
        assert got_nodedup == got_dedup == _union_find(base), f"trial {trial}"

def test_cc_convergence_schedule_independence(spark):
    """r16: the CC loop's labelling must be identical under ANY
    convergence-check schedule and at any max_iter truncation (the
    relax+jump recurrence is schedule-independent; the init-free
    round 1 must cover the whole node universe) — asserted on graphs
    converging after an ODD and an EVEN number of rounds, a
    zero-change-in-round-1 graph (self-loops only), and max_iter
    truncations. Regression cover for the r16 init-frame elimination
    and for the (implemented, measured, REJECTED) check-every-2nd-
    round schedule.
    """
    # star: relax converges in 1 round, observed at round 2
    star = [(10, 11), (10, 12), (10, 13)]
    got = _cc(spark, star)
    assert got == {10: 10, 11: 10, 12: 10, 13: 10}

    # chain of diameter 9: pointer jumping needs >2 rounds
    chain = [(i, i + 1) for i in range(9)]
    assert set(_cc(spark, chain).values()) == {0}

    # self-loops only: round 1 changes nothing at all
    loops = [(7, 7), (8, 8)]
    got = _cc(spark, loops)
    assert got == {7: 7, 8: 8}

    # max_iter truncation: k rounds of the new schedule produce the
    # same labels as k rounds of the old per-round-checked loop (the
    # relax+jump recurrence is schedule-independent). After 1 round of
    # min-label+jump on the 0..9 chain, node 9 cannot yet have label 0.
    df = spark.createDataFrame(chain, "src long, dst long")
    got1 = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iter=1).collect()
    }
    assert got1[1] == 0 and got1[9] > 0
    got2 = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iter=2).collect()
    }
    # monotone: labels only decrease round over round
    assert all(got2[n] <= got1[n] for n in got1)
