"""The mechanical bench-pair acceptance rule (r14; tools/bench_pair.py):
median per-query ratio within ±3%, committed detail = per-query MIN,
canary echoed for context. Pure-python — no Spark."""

from __future__ import annotations

from tools.bench_pair import evaluate


def _detail(values: dict[str, float], canary: float | None = None) -> dict:
    d = {
        "queries_detail": {
            k: {"warm_median_sec": v, "build_sec": 0.1, "exec_sec": v - 0.1,
                "first_run_sec": v + 0.5}
            for k, v in values.items()
        },
        "sf": 0.1,
    }
    if canary is not None:
        d["canary_sec"] = canary
    return d


def test_heavy_tail_noise_accepts_and_min_merges():
    """The r14 pre-pair shape: bulk agrees to ~1%, two heavy queries
    catch one-sided excursions in run 2 — raw totals blow past 3% but
    the median accepts, and the merged detail takes the per-query min."""
    q1 = {f"q{i}": 1.0 for i in range(20)} | {"heavy_a": 5.0, "heavy_b": 4.0}
    q2 = {f"q{i}": 1.01 for i in range(20)} | {"heavy_a": 9.0, "heavy_b": 7.5}
    report, merged = evaluate(_detail(q1, 2.0), _detail(q2, 2.1))
    assert report["accepted"] is True
    assert abs(report["median_query_ratio"] - 1.01) < 1e-6
    assert report["raw_total_delta_pct"] > 3  # the old criterion would reject
    assert merged["queries_detail"]["heavy_a"]["warm_median_sec"] == 5.0
    assert merged["queries_detail"]["heavy_a"]["pair"] == [5.0, 9.0]
    assert merged["queries_detail"]["q0"]["warm_median_sec"] == 1.0
    assert report["canary_ratio"] == round(2.1 / 2.0, 4)


def test_uniform_shift_rejects():
    """The r14 close-(1,2) shape: a uniform 6%+ excursion moves the
    MEDIAN — that is a real disagreement, not heavy-tail noise."""
    q1 = {f"q{i}": 1.0 + i * 0.1 for i in range(20)}
    q2 = {k: v * 1.07 for k, v in q1.items()}
    report, _ = evaluate(_detail(q1), _detail(q2))
    assert report["accepted"] is False
    assert abs(report["median_query_ratio"] - 1.07) < 1e-6
    assert report["canary_ratio"] is None  # pre-r14 details lack the field


def test_min_merge_uses_faster_runs_build_split():
    q1 = {"a": 2.0}
    q2 = {"a": 1.5}
    d1, d2 = _detail(q1), _detail(q2)
    d2["queries_detail"]["a"]["build_sec"] = 0.3
    _, merged = evaluate(d1, d2)
    got = merged["queries_detail"]["a"]
    assert got["warm_median_sec"] == 1.5
    assert got["build_sec"] == 0.3  # split taken from the faster run
