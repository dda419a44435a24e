"""Fail-fast scale guards for verification-only operators.

A few operators exist as EXACT baselines whose job is to prove the
production path correct at oracle scale (brute-force O(n²/2) embedding
pairs, uncapped inverted-index Jaccard). Their complexity is
intentionally unbounded, so pointing one at a real corpus must be an
explicit decision, never an accident: the guard counts the input (one
cheap metadata-backed job next to the quadratic work it prevents) and
raises above a row ceiling unless ``allow_bruteforce=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def guard_bruteforce(df: DataFrame, ceiling: int, what: str, allow: bool) -> None:
    """Raise if ``df`` exceeds ``ceiling`` rows and ``allow`` is False."""
    if allow:
        return
    n = df.count()
    if n > ceiling:
        raise ValueError(
            f"{what} is a VERIFICATION-ONLY exact baseline (super-linear in input "
            f"size): input has {n:,} rows, above the {ceiling:,}-row ceiling. Use "
            f"the production path (LSH/capped variant) or pass allow_bruteforce=True "
            f"to run it anyway."
        )
