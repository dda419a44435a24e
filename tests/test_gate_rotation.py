"""Gate-rotation invariants (round-4 verdict ask #2): the driver's
correctness gate covers the FIRST 50 registry entries; round 5 rotates
in queries never covered by any previous round's gate, and every gated
entry must carry an oracle so the driver records a full hash check."""

from __future__ import annotations

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def _prior_gate_keys() -> set[str]:
    keys: set[str] = set()
    for p in sorted(REPO.glob("CORRECTNESS_r0[1-4].json")):
        keys |= set(json.loads(p.read_text()))
    return keys


def test_r5_gate_prefix_is_fresh_and_oracle_bearing():
    from lakehouse_spark_spark.plans import queries as Q

    first50 = list(Q.queries())[:50]
    assert len(first50) == 50
    prior = _prior_gate_keys()
    assert prior, "expected committed CORRECTNESS_r01..r04 artifacts"
    overlap = set(first50) & prior
    assert overlap == set(), f"r5 gate re-covers already-gated queries: {sorted(overlap)}"
    missing_oracle = [n for n in first50 if Q._REGISTRY[n].oracle is None]
    assert missing_oracle == [], missing_oracle


def test_rotation_list_matches_registry():
    from lakehouse_spark_spark.plans import queries as Q

    unknown = [n for n in Q._GATE_ROTATION_R5 if n not in Q._REGISTRY]
    assert unknown == [], f"rotation names not in registry: {unknown}"
    assert len(Q._GATE_ROTATION_R5) == len(set(Q._GATE_ROTATION_R5))
