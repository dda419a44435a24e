"""Gate-rotation invariants: the driver's correctness gate covers the
FIRST 50 registry entries. Round 5 rotated in queries never covered by
rounds 1-4; round 7 retired the then-outstanding verification debt;
round 8 closed gate debt to zero; round 9 gates its two new queries,
re-gates this round's code/oracle changes, and refreshes the stalest
(r3/r4) coverage; round 10 gates its new persisted-index queries,
re-gates the bloom/curation_v5 code changes, drains the r4 staleness
pool, and starts refreshing the r6-gated set. The standing rule (the r7 verdict's ask): EVERY
registry query must either already have a driver-recorded CORRECTNESS
row or sit inside the current gate prefix — so adding a query to the
registry after the gate list was cut must extend the rotation in the
same commit."""

from __future__ import annotations

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def _gate_keys(pattern: str) -> set[str]:
    keys: set[str] = set()
    for p in sorted(REPO.glob(pattern)):
        keys |= set(json.loads(p.read_text()))
    return keys


def test_no_query_escapes_driver_verification():
    """The standing invariant: registry ⊆ gated(r01..r08) ∪ the current
    50-query gate prefix. A query added without extending the rotation
    fails here — the failure class of round 7
    (similarity_graph_triangles was added post-gate and broke the
    suite)."""
    from lakehouse_spark_spark.plans import queries as Q

    first50 = list(Q.queries())[:50]
    assert len(first50) == 50
    prior = _gate_keys("CORRECTNESS_r[0-9][0-9].json")  # 2-digit-safe: r01..r10+
    assert prior, "expected committed CORRECTNESS_r01..r10 artifacts"
    leftover = set(Q._REGISTRY) - prior - set(first50)
    assert leftover == set(), (
        f"queries with no driver check and outside the gate prefix "
        f"(extend _GATE_ROTATION_R15 in the same commit): {sorted(leftover)}"
    )


def test_r15_gate_front_loads_oracle_bearing_entries():
    """Oracle-bearing gate entries precede rows-only ones, so the
    driver records full hash checks for all of them even if it ever
    truncates below 50."""
    from lakehouse_spark_spark.plans import queries as Q

    first50 = list(Q.queries())[:50]
    oracle_flags = [Q._REGISTRY[n].oracle is not None for n in first50]
    assert oracle_flags == sorted(oracle_flags, reverse=True), first50


R14_NEW_OR_CHANGED = {
    # born in r14
    "index_takedown_lifecycle",
    "media_index_skew_health",
    "bloom_saturation_cycle",
    # code touched in r14: tombstone anti-joins ride every persisted
    # family's load path; the shared Hamming join + media wrappers
    # gained the size-aware hot broadcast and approx_count plumbing;
    # the ANN search tails re-apply the tombstone filter; the ingest
    # loops record skew; the disposition passes footer-derived counts
    "simhash_candidates",
    "image_neardup_dhash",
    "image_neardup_phash",
    "audio_neardup_afp",
    "video_neardup_phash",
    "multimodal_dedup_disposition",
    "media_neardup_persisted_ingest",
    "neardup_persisted_ingest",
    "bloom_incremental_dedup",
    "bloom_persisted_ingest_run2",
    "bloom_persisted_ingest_steady",
    "decon_persisted_ingest",
    "embedding_ivfpq_persisted_topk",
    "embedding_ivfpq_distributed_topk",
    "embedding_semdedup_persisted_ingest",
    "embedding_semdedup_multiprobe",
    "embedding_semantic_join_indexes",
    "ann_index_rebuild_cycle",
    "ann_index_health_diag",
}


def test_r14_gate_covered_that_rounds_code_changes():
    """Historical invariant (the r14 gate was the live prefix then):
    everything new or code-changed in round 14 sat inside the r14
    rotation list, and the committed CORRECTNESS_r14 artifact therefore
    carries a driver hash for each."""
    from lakehouse_spark_spark.plans import queries as Q

    assert R14_NEW_OR_CHANGED <= set(Q._GATE_ROTATION_R14), sorted(
        R14_NEW_OR_CHANGED - set(Q._GATE_ROTATION_R14)
    )


def test_r14_gate_refreshes_the_stalest_coverage():
    """The staleness contract for the r14 window: every slot that isn't
    new/changed re-gates a query whose most recent driver hash is r9 or
    r10 — the oldest in the fleet after r13 drained the r8 remnant. A
    never-gated name in a stale slot fails loudly (it belongs in
    new_or_changed)."""
    import glob

    from lakehouse_spark_spark.plans import queries as Q

    # r01..r13 only: the state the R14 list was cut FROM
    last: dict[str, int] = {}
    for p in sorted(glob.glob(str(REPO / "CORRECTNESS_r[0-9][0-9].json"))):
        rnd = int(p.rsplit("_r", 1)[1].split(".")[0])
        if rnd >= 14:
            continue
        for k in json.loads(pathlib.Path(p).read_text()):
            last[k] = max(last.get(k, 0), rnd)
    stale_slots = [n for n in Q._GATE_ROTATION_R14 if n not in R14_NEW_OR_CHANGED]
    never_gated = [n for n in stale_slots if n not in last]
    assert never_gated == [], (
        f"stale slots with no prior driver hash — move to new_or_changed "
        f"or fix the rotation: {never_gated}"
    )
    assert all(last[n] in (9, 10) for n in stale_slots), [
        (n, last[n]) for n in stale_slots if last[n] not in (9, 10)
    ]


R15_NEW_OR_CHANGED = {
    # born in r15
    "takedown_audit",
    "curation_v5_retraction_accounting",
    # code touched in r15: the takedown lifecycle rewritten (kept-
    # ledger retraction leg, threaded probes, purge-state recording);
    # bloom fill stats observed on the write job (both persisted-ingest
    # entries + the saturation cycle ride write/update/rebuild); the
    # media streaming loop records the kept-ledger owner sidecar
    # (rides the skew-health query's guarded ingest epochs)
    "index_takedown_lifecycle",
    "bloom_persisted_ingest_run2",
    "bloom_persisted_ingest_steady",
    "bloom_saturation_cycle",
    "media_index_skew_health",
}


def test_r15_gate_covers_this_rounds_code_changes():
    """Everything new or whose executed path changed in round 15 gets a
    driver hash: the two queries born this round (compliance audit,
    retraction accounting) and the queries riding the r15 reworks
    (lifecycle rewrite, observed bloom fill stats, kept-ledger owner
    sidecar in the media loop)."""
    from lakehouse_spark_spark.plans import queries as Q

    first50 = set(list(Q.queries())[:50])
    assert R15_NEW_OR_CHANGED <= first50, sorted(R15_NEW_OR_CHANGED - first50)


def test_r15_gate_refreshes_the_stalest_coverage():
    """The staleness contract for the r15 window: every slot that isn't
    new/changed re-gates a query whose most recent driver hash is r10
    or r11 — the oldest in the fleet after r14 drained the r9 remnant
    (the whole 41-key r10 pool is covered, plus the start of r11's). A
    never-gated name in a stale slot fails loudly (it belongs in
    new_or_changed)."""
    import glob

    from lakehouse_spark_spark.plans import queries as Q

    # r01..r14 only: the state the R15 list was cut FROM
    last: dict[str, int] = {}
    for p in sorted(glob.glob(str(REPO / "CORRECTNESS_r[0-9][0-9].json"))):
        rnd = int(p.rsplit("_r", 1)[1].split(".")[0])
        if rnd >= 15:
            continue
        for k in json.loads(pathlib.Path(p).read_text()):
            last[k] = max(last.get(k, 0), rnd)
    stale_slots = [n for n in Q._GATE_ROTATION_R15 if n not in R15_NEW_OR_CHANGED]
    never_gated = [n for n in stale_slots if n not in last]
    assert never_gated == [], (
        f"stale slots with no prior driver hash — move to new_or_changed "
        f"or fix the rotation: {never_gated}"
    )
    assert all(last[n] in (10, 11) for n in stale_slots), [
        (n, last[n]) for n in stale_slots if last[n] not in (10, 11)
    ]
    # the r10 pool is drained COMPLETELY this round (the verdict's ask)
    r10_pool = {k for k, r in last.items() if r == 10 and k in Q._REGISTRY}
    assert r10_pool <= set(Q._GATE_ROTATION_R15), sorted(
        r10_pool - set(Q._GATE_ROTATION_R15)
    )


def test_r14_gate_recorded_exactly_its_rotation():
    """Historical invariant: the committed CORRECTNESS_r14 artifact
    covers exactly the round-14 rotation list."""
    from lakehouse_spark_spark.plans import queries as Q

    r14 = set(json.loads((REPO / "CORRECTNESS_r14.json").read_text()))
    assert r14 == set(Q._GATE_ROTATION_R14)


def test_r13_gate_recorded_exactly_its_rotation():
    """Historical invariant: the committed CORRECTNESS_r13 artifact
    covers exactly the round-13 rotation list."""
    from lakehouse_spark_spark.plans import queries as Q

    r13 = set(json.loads((REPO / "CORRECTNESS_r13.json").read_text()))
    assert r13 == set(Q._GATE_ROTATION_R13)


def test_r12_gate_recorded_exactly_its_rotation():
    """Historical invariant: the committed CORRECTNESS_r12 artifact
    covers exactly the round-12 rotation list."""
    from lakehouse_spark_spark.plans import queries as Q

    r12 = set(json.loads((REPO / "CORRECTNESS_r12.json").read_text()))
    assert r12 == set(Q._GATE_ROTATION_R12)


def test_r11_gate_recorded_exactly_its_rotation():
    """Historical invariant: the committed CORRECTNESS_r11 artifact
    covers exactly the round-11 rotation list."""
    from lakehouse_spark_spark.plans import queries as Q

    r11 = set(json.loads((REPO / "CORRECTNESS_r11.json").read_text()))
    assert r11 == set(Q._GATE_ROTATION_R11)


def test_r7_gate_recorded_exactly_its_rotation():
    """Historical invariant: the committed CORRECTNESS_r07 artifact
    covers exactly the round-7 rotation list (the driver gated the
    first 50 names, which were the R7 list verbatim)."""
    from lakehouse_spark_spark.plans import queries as Q

    r07 = set(json.loads((REPO / "CORRECTNESS_r07.json").read_text()))
    assert r07 == set(Q._GATE_ROTATION_R7)


def test_r5_gate_prefix_was_fresh_and_oracle_bearing():
    """Historical invariant: the r5/r6 rotation list stays disjoint from
    the r1-r4 gates and fully oracle-bearing (it is what CORRECTNESS_r05
    and r06 actually recorded)."""
    from lakehouse_spark_spark.plans import queries as Q

    first50 = Q._GATE_ROTATION_R5[:50]
    prior = _gate_keys("CORRECTNESS_r0[1-4].json")
    assert prior, "expected committed CORRECTNESS_r01..r04 artifacts"
    assert set(first50) & prior == set()
    missing_oracle = [n for n in first50 if Q._REGISTRY[n].oracle is None]
    assert missing_oracle == [], missing_oracle


def test_rotation_lists_match_registry():
    from lakehouse_spark_spark.plans import queries as Q

    for rot in (
        Q._GATE_ROTATION_R5,
        Q._GATE_ROTATION_R7,
        Q._GATE_ROTATION_R8,
        Q._GATE_ROTATION_R9,
        Q._GATE_ROTATION_R10,
        Q._GATE_ROTATION_R11,
        Q._GATE_ROTATION_R12,
        Q._GATE_ROTATION_R13,
        Q._GATE_ROTATION_R14,
        Q._GATE_ROTATION_R15,
    ):
        unknown = [n for n in rot if n not in Q._REGISTRY]
        assert unknown == [], f"rotation names not in registry: {unknown}"
        assert len(rot) == len(set(rot))
    assert len(Q._GATE_ROTATION_R8) == 50
    assert len(Q._GATE_ROTATION_R9) == 50
    assert len(Q._GATE_ROTATION_R10) == 50
    assert len(Q._GATE_ROTATION_R11) == 50
    assert len(Q._GATE_ROTATION_R12) == 50
    assert len(Q._GATE_ROTATION_R13) == 50
    assert len(Q._GATE_ROTATION_R14) == 50
    assert len(Q._GATE_ROTATION_R15) == 50


def test_r11_gate_refreshes_the_stalest_coverage():
    """The staleness contract: every non-(new/changed) slot in the r11
    window re-gates a query whose most recent driver hash is r6 or r7
    — the oldest in the fleet after r10 drained r4 and started on r6.
    Every such slot MUST already appear in the prior-gate history: a
    never-gated name in a stale slot is a rotation bug (it belongs in
    new_or_changed), and silently skipping it would hide exactly the
    escape test_no_query_escapes_driver_verification exists to catch
    (the r10 ADVICE finding — the old filter `n in last` passed
    unknown names without a word)."""
    import glob

    from lakehouse_spark_spark.plans import queries as Q

    # r01..r10 only: the staleness claim is about the state the R11
    # list was cut FROM — including this round's own
    # CORRECTNESS_r11.json (committed by the driver later) would flip
    # every stale slot
    last: dict[str, int] = {}
    for p in sorted(glob.glob(str(REPO / "CORRECTNESS_r[0-9][0-9].json"))):
        rnd = int(p.rsplit("_r", 1)[1].split(".")[0])
        if rnd >= 11:
            continue
        for k in json.loads(pathlib.Path(p).read_text()):
            last[k] = max(last.get(k, 0), rnd)
    new_or_changed = {
        # born in r11
        "decon_persisted_ingest",
        "embedding_ivfpq_distributed_topk",
        "ann_index_health_diag",
        "embedding_semantic_join_indexes",
        # rows-only re-gates: code touched by the r11 reworks
        # (vectorized LUT kernel; multi-probe semantic dedup; hot-band
        # probe cap)
        "embedding_ivfpq_persisted_topk",
        "embedding_semdedup_persisted_ingest",
        "embedding_ivfpq_topk",
        "neardup_persisted_ingest",
    }
    stale_slots = [n for n in Q._GATE_ROTATION_R11 if n not in new_or_changed]
    never_gated = [n for n in stale_slots if n not in last]
    assert never_gated == [], (
        f"stale slots with no prior driver hash — move to new_or_changed "
        f"or fix the rotation: {never_gated}"
    )
    assert all(last[n] in (6, 7) for n in stale_slots), [
        (n, last[n]) for n in stale_slots if last[n] not in (6, 7)
    ]


def test_r12_gate_refreshes_the_stalest_coverage():
    """The staleness contract for the r12 window: every slot that isn't
    new/changed re-gates a query whose most recent driver hash is r7 or
    r8 — the oldest in the fleet after r11 drained r6 and the r7
    oracle-bearing prefix. A never-gated name in a stale slot fails
    loudly (it belongs in new_or_changed)."""
    import glob

    from lakehouse_spark_spark.plans import queries as Q

    # r01..r11 only: the state the R12 list was cut FROM
    last: dict[str, int] = {}
    for p in sorted(glob.glob(str(REPO / "CORRECTNESS_r[0-9][0-9].json"))):
        rnd = int(p.rsplit("_r", 1)[1].split(".")[0])
        if rnd >= 12:
            continue
        for k in json.loads(pathlib.Path(p).read_text()):
            last[k] = max(last.get(k, 0), rnd)
    new_or_changed = {
        # born in r12
        "image_neardup_dhash",
        "image_neardup_phash",
        "audio_neardup_afp",
        "video_neardup_phash",
        "multimodal_dedup_disposition",
        "embedding_semdedup_multiprobe",
        "ann_index_rebuild_cycle",
        # rows-only re-gates: code touched by the r12 reworks (ANN
        # recall panel + occupancy tracker + health schema + max_cell;
        # near-dup probe exact-signature rescue)
        "ann_index_health_diag",
        "embedding_semdedup_persisted_ingest",
        "embedding_semantic_join_indexes",
        "embedding_ivfpq_persisted_topk",
        "embedding_ivfpq_distributed_topk",
        "neardup_persisted_ingest",
    }
    stale_slots = [n for n in Q._GATE_ROTATION_R12 if n not in new_or_changed]
    never_gated = [n for n in stale_slots if n not in last]
    assert never_gated == [], (
        f"stale slots with no prior driver hash — move to new_or_changed "
        f"or fix the rotation: {never_gated}"
    )
    assert all(last[n] in (7, 8) for n in stale_slots), [
        (n, last[n]) for n in stale_slots if last[n] not in (7, 8)
    ]
