"""Connected components over a pair graph: dedup CLUSTER formation.

Near-dup detection (operators/neardup.py) emits PAIRS; production dedup
at 100 TB needs CLUSTERS — transitively-closed groups with one kept
representative per group. A pairwise drop rule ("drop the greater id of
each pair") keeps every local minimum of the pair graph; the cluster
rule keeps exactly one doc per connected component. Both are
deterministic, but the cluster rule is the standard corpus-dedup
semantics (MinHash-dedup as described in the Lee et al. 2021
"Deduplicating Training Data Makes Language Models Better" setup).

Algorithm: iterative min-label propagation with pointer jumping.

- state: ``(node, component)``, initialized component = node.
- each round: component(v) ← min(component(v), min over neighbours u of
  component(u)), then one pointer-jump round
  component(v) ← min(component(v), component(component(v))) which
  collapses chains logarithmically (the chain a-b-c-d-… converges in
  O(log diameter) rounds instead of O(diameter)).
- convergence: stop when no label changed (an `Any changed?` aggregate
  per round — a distributed action, not a data collect; the loop is
  driver-side CONTROL only, all data movement is joins/groupBys).
  (A check-every-2nd-round schedule was implemented and A/B-measured
  in r16: a wash on 2-round graphs, a consistent LOSS on longer ones —
  the deferred round's persist + deeper adaptive plan costs more than
  the saved action. Rejected; the per-round check stays.)
- every round ends in ``localCheckpoint`` to truncate lineage (the
  standard Spark idiom for iterative algorithms; at scale this is a
  checkpoint to the cluster store).

Scale design: each round is two shuffles (neighbour min groupBy + the
pointer-jump self-join) keyed by node id — uniform unless one component
is huge, and the min-label representative acts as the natural combiner
(partial aggregation). For graphs with billions of edges the
alternating large-star/small-star scheme (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) halves round count; the
min+jump loop here matches its asymptotics for the near-dup graphs this
engine targets (components are small — dup clusters, not social graphs).

The fixpoint is EXACT and unique (min reachable id per node), so the
result is oracle-checkable with a recursive CTE — no hash-seed or
ordering sensitivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    dedup_edges: bool = True,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id reachable from it: ``(node, component)``.

    Deterministic: the fixpoint (min reachable id) does not depend on
    iteration order or partitioning. ``max_iter`` bounds the loop; with
    pointer jumping, 25 rounds covers any component diameter up to
    ~2^25 — raise only for pathological chain graphs.

    ``dedup_edges=False`` skips the ``distinct()`` on the symmetric
    edge list — one full shuffle+aggregate of the edge table saved per
    call. Edge MULTIPLICITY never changes the result (duplicate edges
    only duplicate messages, and the per-node groupBy-min absorbs
    them; the convergence count is computed per node after the
    groupBy), so this is purely a performance knob: pass False when
    the input is already pair-distinct (every pair generator in this
    engine emits (a<b)-canonical deduped pairs), keep the default True
    for edge lists with meaningful duplication, where shrinking the
    per-round join input is worth the one-time shuffle.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    if dedup_edges:
        sym = sym.distinct()
    # cache the (static) symmetric edge list across rounds
    sym = sym.localCheckpoint(eager=False)
    comp_type = sym.schema["u"].dataType

    if max_iter <= 0:
        return (
            sym.select(F.col("u").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
        )

    from pyspark.sql import Observation

    # r16: no separate identity label frame. Round 1's relax over the
    # identity map is min(own id, min neighbour id) — computable as
    # least(node, min(cand)) AFTER the groupBy, straight off the edge
    # list (every node of the symmetric list appears on the v side, so
    # the groupBy covers the whole node universe). The r15 shape built
    # labels = sym.distinct() + localCheckpoint first: one extra
    # exchange plus a build-time checkpoint materialization whose only
    # consumer was the round-1 union side.
    labels = None
    for it in range(max_iter):
        # messages: each node's neighbours' current labels; round 1
        # reads them straight off the edge list (identity labels).
        # relax, FUSED (r15): one unionByName + groupBy-min over
        # {own label} ∪ {neighbour labels} — identical fixpoint
        # arithmetic to groupBy-min + join-back, one exchange and one
        # join fewer per round. The __old side-channel (non-null on
        # exactly one row per node — the node's own; aggregates skip
        # nulls; the identity `node` itself in round 1) feeds the
        # Observation convergence count with no extra join/action.
        if it == 0:
            relaxed = (
                sym.select(F.col("v").alias("node"), F.col("u").alias("cand"))
                .groupBy("node")
                .agg(F.min("cand").alias("__mc"))
                .select(
                    "node",
                    F.least(F.col("node"), F.col("__mc")).alias("component"),
                    F.col("node").alias("__old"),
                )
            )
        else:
            msgs = sym.join(labels, sym["u"] == labels["node"]).select(
                F.col("v").alias("node"), F.col("component").alias("cand")
            )
            relaxed = (
                labels.select(
                    "node", F.col("component").alias("cand"), F.col("component").alias("__old")
                )
                .unionByName(msgs.withColumn("__old", F.lit(None).cast(comp_type)))
                .groupBy("node")
                .agg(F.min("cand").alias("component"), F.max("__old").alias("__old"))
            )
        # pointer jump: follow the label's own label one hop
        parents = relaxed.select(F.col("node").alias("pnode"), F.col("component").alias("pcomp"))
        obs = Observation()
        new_comp = F.least(F.col("component"), F.coalesce(F.col("pcomp"), F.col("component")))
        labels = (
            relaxed.join(parents, relaxed["component"] == parents["pnode"], "left")
            .select(
                "node",
                new_comp.alias("component"),
                # labels only decrease, so "round changed anything" is
                # exactly "final label != pre-round label"
                (new_comp != F.col("__old")).cast("long").alias("__chg"),
            )
            .observe(obs, F.sum("__chg").alias("changed"))
            .select("node", "component")
            .localCheckpoint()  # eager: materialize the round, truncate lineage
        )
        if (obs.get["changed"] or 0) == 0:
            break
    return labels


def components_with_singletons(
    all_nodes: DataFrame, components: DataFrame, id_col: str
) -> DataFrame:
    """Extend a component labelling to the full node universe: nodes
    with no edge become their own singleton component.
    Returns ``(id_col, component)`` for every row of ``all_nodes``."""
    return (
        all_nodes.select(id_col)
        .join(components, all_nodes[id_col] == components["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        )
    )


def cluster_representatives(components: DataFrame) -> DataFrame:
    """Per-cluster dedup decision from a ``(node, component)`` labelling:
    keep the component minimum (== the component id itself), drop the
    rest. Returns ``(node, component, is_representative)``."""
    return components.select(
        "node",
        "component",
        (F.col("node") == F.col("component")).alias("is_representative"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    scale: int = 9,
) -> DataFrame:
    """Fixed-iteration PageRank with DETERMINISTIC integer arithmetic.

    Returns ``(node, rank)`` where rank is the N-NORMALIZED PageRank
    (classic rank x number-of-nodes): init 1, update
    rank(v) <- (1-d) + d * sum over in-edges of rank(u)/out_degree(u).
    Normalizing by N makes every constant an EXACT decimal literal (no
    1/N rounding). The per-edge quotient rank(u)*d/out_degree(u) is
    half-up rounded to ``scale`` decimals ENTIRELY IN INTEGER
    ARITHMETIC: ranks are carried as BIGINT units of 10^-scale and,
    with damping = num/den expressed as an exact rational,
    ``half_up(R*num/(den*deg)) = (2*num*R + den*deg) div (2*den*deg)``
    for positive operands — Spark's ``div`` and DuckDB's ``//`` both
    truncate identically there, so the recurrence is bit-identical
    across engines. (Rounding the IEEE-double quotient with each
    engine's native ROUND diverges at true .5 ties — rank/out_degree
    quotients of small integers DO terminate — which was the exact
    failure class fixed for min_cost_supplier.) Per-node sums of
    integer units are partition/merge-order independent, which is what
    lets the registry unroll the same iterations into a DuckDB oracle
    (same determinism contract as operators/lm.py).

    Overflow headroom: unit values are bounded by N*10^scale (total
    rank mass is N), so the 2*num*R numerator fits BIGINT up to
    N ~ 5*10^8 nodes at scale=9; beyond that, widen the expression to
    DECIMAL(38,0) — the identity is unchanged.

    Dangling nodes (no out-edges) leak their mass — the convention that
    keeps the recurrence local; they still RECEIVE rank. The iteration
    count is fixed, not convergence-probed: PageRank contracts
    geometrically at rate d, so k iterations bound the error at d^k
    without paying a distributed action per round.

    Scale: out_degree is stamped onto the (checkpointed) edge table
    ONCE before the loop; each iteration is then one LEFT join of that
    edges_deg frame against the previous round's per-node aggregate
    (rank(src) = base + coalesce(in_rank, 0) — round 1 reads the
    literal init rank with no join at all) plus one groupBy(dst)
    shuffle of (dst, contrib) pairs; the full node→rank map is
    reconstructed once AFTER the last round. The iteration count is
    fixed and small, so the chained plan stays bounded and no per-round
    checkpoint is needed (unlike the convergence-probed CC loop).
    """
    from fractions import Fraction

    dec = f"decimal(28,{scale})"
    unit = 10**scale
    frac = Fraction(damping).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    base_units = round((1 - frac) * unit)  # exact: (den-num)*unit/den must be integral
    if (1 - frac) * unit != base_units:
        raise ValueError(f"damping {damping} not representable at scale {scale}")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(F.count(F.lit(1)).alias("out_degree"))
    # the degree join is LOOP-INVARIANT: stamp out_degree onto the edge
    # table once (and checkpoint it) instead of re-joining every round —
    # one join per iteration instead of two, at any graph size
    # (measured 9.1 -> 4.5 s warm on supplier_pagerank at sf0.1)
    edges_deg = (
        edges.join(out_deg.withColumnRenamed("node", src), src)
        .select(F.col(src), F.col(dst), F.col("out_degree"))
        .localCheckpoint(eager=False)
    )
    contrib_units = F.expr(
        f"({2 * num} * rank_units + {den} * out_degree) div ({2 * den} * out_degree)"
    )
    # NO per-round checkpoint (r15): the iteration count is FIXED and
    # small, so the chained plan stays bounded (iterations × 3 operators
    # deep) — unlike the convergence-probed CC loop there is nothing to
    # truncate. Under AQE each lazy localCheckpoint here used to run
    # all-but-the-final stage of its round as separate driver-submitted
    # jobs at BUILD time plus an RDD row-copy per round; dropping them
    # executes the whole recurrence as one adaptive query at action
    # time — total wall equal within host noise at sf0.1 (isolated A/B
    # ~4.3-4.6 s both shapes), but 5 driver job submissions + 5 row
    # copies fewer per call, output bit-identical (oracle-checked).
    # The `nodes` / `edges_deg` pins above stay: they are the
    # loop-invariant frames every round re-reads.
    # Per-round shape (r15 opt round): the recurrence needs the FULL
    # node->rank map only at the END — inside the loop, ranks are only
    # ever read at edge sources, so the per-round `nodes ⟕ summed`
    # reconstruction join is deferred out of the loop entirely.
    # Round 1 reads the identity rank (all nodes at `unit`) — a literal
    # column, no join at all (the CC round-1 trick); round k>1 stamps
    # rank(src) = base + coalesce(in_rank, 0) via one LEFT join of the
    # edge table against the previous round's aggregate (a src absent
    # from `summed` has no in-edges, exactly the base-rank case). One
    # join per round instead of two, same bit-identical integer
    # recurrence at any graph size.
    if iterations <= 0:
        return nodes.select(
            "node", F.lit(1).cast("bigint").cast(dec).alias("rank")
        )
    summed = None
    rank_col = (F.lit(base_units) + F.coalesce(F.col("in_rank"), F.lit(0))).cast("bigint")
    for it in range(iterations):
        if it == 0:
            cur = edges_deg.withColumn("rank_units", F.lit(unit).cast("bigint"))
        else:
            cur = edges_deg.join(summed.withColumnRenamed("node", src), src, "left").withColumn(
                "rank_units", rank_col
            )
        contribs = cur.select(F.col(dst).alias("node"), contrib_units.alias("contrib"))
        summed = contribs.groupBy("node").agg(F.sum("contrib").alias("in_rank"))
    ranks = nodes.join(summed, "node", "left").select(
        "node", rank_col.alias("rank_units")
    )
    # exact decimal reconstruction: units/10^scale has <= `scale` decimals,
    # and Spark's decimal-division result scale (>= scale here) preserves it
    return ranks.select(
        "node",
        (F.col("rank_units").cast("decimal(29,9)") / F.lit(unit)).cast(dec).alias("rank"),
    )


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex triangle participation via DEGREE-ORDERED edge
    orientation — the standard distributed triangle algorithm (Suri &
    Vassilvitskii, WWW'11 "Counting Triangles and the Curse of the Last
    Reducer"; same orientation as Latapy 2008 compact-forward).

    ``edges`` is an undirected simple edge list (each edge once, any
    endpoint order, no self-loops). Orient every edge from its
    (degree, id)-lexicographically smaller endpoint to the larger; in
    that total order each triangle {u < v < w} carries edges u->v,
    u->w, v->w, so it is enumerated EXACTLY once as the wedge
    (u->v, u->w) closed by the oriented edge v->w. Why this scales:
    out-degree under degree orientation is <= O(sqrt(2m)) regardless of
    skew (a vertex keeps an out-edge only toward HIGHER-degree
    neighbours, and there can be at most ~sqrt(2m) vertices of degree
    >= sqrt(2m)), so the wedge self-join emits O(m^1.5) rows worst-case
    — the hub vertex that breaks the naive neighbourhood join
    contributes almost nothing, because its edges all point INTO it.

    Plan shape: degree groupBy (one shuffle, map-side combined), two
    broadcast-eligible joins to stamp endpoint degrees, the wedge
    self-join hash-partitioned on the pivot id, and the closing join
    hash-partitioned on (v, w) — slim long-only rows throughout; no
    driver-side data.

    Returns ``(doc_id, tri_count, degree)`` for every vertex that
    participates in >= 1 triangle (degree = undirected match degree).
    """
    # The edge list feeds deg (twice via the union), the stamping join,
    # and — through the orientation — three more consumers. Without
    # lineage truncation every reuse REPLICATES the upstream plan (for
    # the ER similarity graph that multiplied the whole canopy
    # candidate pipeline ~8x: 191 Exchange nodes in the physical plan);
    # checkpointing the slim frames keeps the plan linear. At scale
    # these are the standard triangle-counting materializations: e is
    # 2 longs/row, o is 3 longs/row.
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("doc_id"))
        .unionAll(e.select(F.col("b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    stamped = (
        e.join(deg.select(F.col("doc_id").alias("a"), F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("doc_id").alias("b"), F.col("degree").alias("db")), "b")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = stamped.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("ddst"),
    ).localCheckpoint(eager=False)  # consumed by both wedge sides + the closing join
    # wedge at the pivot: two out-edges, dst endpoints ordered by the
    # same (degree, id) total order so the closing edge is v->w
    x = o.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("ddst").alias("dv"))
    y = o.select(F.col("src").alias("u"), F.col("dst").alias("w"), F.col("ddst").alias("dw"))
    wedges = x.join(y, "u").filter(
        F.struct(F.col("dv"), F.col("v")) < F.struct(F.col("dw"), F.col("w"))
    )
    closing = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    # one explode, not a 3-way unionAll of per-endpoint selects: the
    # union form embedded the whole wedge+closing join pyramid once PER
    # BRANCH (three copies in the physical plan — column pruning makes
    # the branches non-identical, so exchange reuse cannot collapse
    # them), executing the O(m^1.5) join three times. explode emits the
    # same (doc_id) multiset from ONE copy of the join.
    verts = tri.select(F.explode(F.array("u", "v", "w")).alias("doc_id"))
    return (
        verts.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tri_count"))
        .join(deg, "doc_id")
        .select("doc_id", "tri_count", "degree")
    )
