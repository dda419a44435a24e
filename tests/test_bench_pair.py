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


# --- N-run fallback (r15 host incident, made mechanical) ---

from tools.bench_pair import evaluate_runs


def test_n_runs_accepted_adjacent_pair_wins():
    """Three runs where (2,3) agree: the fallback must behave exactly
    like running the tool on those two files — no min-of-N."""
    q1 = {f"q{i}": 1.0 for i in range(10)}
    q2 = {k: v * 1.10 for k, v in q1.items()}   # run 2: uniform slow
    q3 = {k: v * 1.11 for k, v in q1.items()}   # run 3: agrees with 2
    report, merged = evaluate_runs([_detail(q1), _detail(q2), _detail(q3)])
    assert report["host_incident"] is False
    assert report["accepted_pair"] == [2, 3]
    pairwise, pair_merged = evaluate(_detail(q2), _detail(q3))
    assert report["pair"] == pairwise
    assert merged == pair_merged


def test_n_runs_host_incident_min_of_n():
    """The r15 close shape: every adjacent pair off by >3% median —
    committed detail is the per-query min across ALL runs, each query
    records all values, and the argmin spread is reported."""
    q1 = {f"q{i}": 1.0 for i in range(10)}
    q2 = {k: v * 1.2 for k, v in q1.items()}
    q3 = {k: (0.9 if k == "q0" else v * 1.1) for k, v in q2.items()}
    report, merged = evaluate_runs(
        [_detail(q1, 1.9), _detail(q2, 2.7), _detail(q3, 2.1)]
    )
    assert report["host_incident"] is True
    assert report["accepted_pair"] is None
    assert len(report["adjacent_pairs"]) == 2
    got = merged["queries_detail"]["q0"]
    assert got["warm_median_sec"] == 0.9          # min came from run 3
    assert got["runs"] == [1.0, 1.2, 0.9]
    assert merged["queries_detail"]["q1"]["warm_median_sec"] == 1.0
    assert report["argmin_run_spread"] == {1: 9, 3: 1}
    assert merged["canary_sec"] == [1.9, 2.7, 2.1]
    assert merged["basis"].startswith("per_query_min_of_3")


def test_two_files_cli_path_unchanged():
    """N=2 must keep the standing pair rule byte-identical."""
    q1 = {"a": 1.0}
    q2 = {"a": 1.01}
    r_pair, m_pair = evaluate(_detail(q1), _detail(q2))
    assert r_pair["accepted"] is True
    assert m_pair["queries_detail"]["a"]["pair"] == [1.0, 1.01]
