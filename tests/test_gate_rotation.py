"""Gate-rotation invariants: the driver's correctness gate covers the
FIRST 50 registry entries. Round 5 rotated in queries never covered by
rounds 1-4; round 7 retires the remaining verification debt — every
query absent from ALL committed CORRECTNESS_r01..r06 artifacts must sit
inside the round-7 gate prefix, so after r7 every registry query has a
driver-recorded check at least once."""

from __future__ import annotations

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def _gate_keys(pattern: str) -> set[str]:
    keys: set[str] = set()
    for p in sorted(REPO.glob(pattern)):
        keys |= set(json.loads(p.read_text()))
    return keys


def test_r7_gate_prefix_retires_all_verification_debt():
    from lakehouse_spark_spark.plans import queries as Q

    first50 = list(Q.queries())[:50]
    assert len(first50) == 50
    prior = _gate_keys("CORRECTNESS_r0[1-6].json")
    assert prior, "expected committed CORRECTNESS_r01..r06 artifacts"
    never_gated = set(Q._REGISTRY) - prior
    leftover = never_gated - set(first50)
    assert leftover == set(), f"never-gated queries outside the r7 gate: {sorted(leftover)}"


def test_r7_gate_front_loads_oracle_bearing_debt():
    """The 24 oracle-bearing never-gated queries come before the
    rows-only ones, so the driver records full hash checks for all of
    them even if it ever truncates below 50."""
    from lakehouse_spark_spark.plans import queries as Q

    prior = _gate_keys("CORRECTNESS_r0[1-6].json")
    first50 = list(Q.queries())[:50]
    debt = [n for n in first50 if n not in prior]
    oracle_flags = [Q._REGISTRY[n].oracle is not None for n in debt]
    # all oracle-bearing debt entries precede all rows-only debt entries
    assert oracle_flags == sorted(oracle_flags, reverse=True), debt


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

    for rot in (Q._GATE_ROTATION_R5, Q._GATE_ROTATION_R7):
        unknown = [n for n in rot if n not in Q._REGISTRY]
        assert unknown == [], f"rotation names not in registry: {unknown}"
        assert len(rot) == len(set(rot))
