"""Compare two bench JSON artifacts (the driver's one-line format or a
file whose last line is that JSON) on their COMMON query set.

    python tools/bench_compare.py OLD NEW [--top N]

Prints one JSON line: common-set totals, geomean ratio (new/old),
canary ratio, counts of >10% regressed/improved, and the N worst/best
per-query ratios. Used for the r16 opening adjudication (r15 verdict
item 1) and for pre/close round accounting.
"""

from __future__ import annotations

import argparse
import json
import math


def _load(path: str) -> dict:
    with open(path) as fh:
        txt = fh.read().strip()
    # BENCH_r{N}.json artifacts wrap the line under "tail"/"parsed"
    try:
        obj = json.loads(txt)
        if isinstance(obj, dict) and "parsed" in obj and obj["parsed"]:
            return obj["parsed"]
        if isinstance(obj, dict) and "queries" in obj:
            return obj
        if isinstance(obj, dict) and "queries_detail" in obj:
            # bench_detail_latest.json shape
            cs = obj.get("canary_sec")
            if isinstance(cs, list):  # pair-merged detail: per-run canaries
                cs = min(cs)
            return {
                "queries": {
                    k: v.get("warm_median_sec", v.get("first_run_sec"))
                    for k, v in obj["queries_detail"].items()
                },
                "canary_sec": cs,
            }
        if isinstance(obj, dict) and "tail" in obj:
            return json.loads(obj["tail"])
    except json.JSONDecodeError:
        pass
    for line in reversed(txt.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"no bench JSON found in {path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=8)
    args = ap.parse_args()
    a, b = _load(args.old), _load(args.new)
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    ratios = {q: (qb[q] / qa[q] if qa[q] > 0 else float("nan")) for q in common}
    vals = [r for r in ratios.values() if r == r and r > 0]
    geomean = math.exp(sum(math.log(r) for r in vals) / len(vals)) if vals else float("nan")
    med = sorted(vals)[len(vals) // 2] if vals else float("nan")
    out = {
        "n_common": len(common),
        "old_total_common": round(sum(qa[q] for q in common), 3),
        "new_total_common": round(sum(qb[q] for q in common), 3),
        "geomean_new_over_old": round(geomean, 4),
        "median_new_over_old": round(med, 4),
        "n_regressed_gt10": sum(1 for r in vals if r > 1.10),
        "n_improved_gt10": sum(1 for r in vals if r < 0.90),
        "canary_old": a.get("canary_sec"),
        "canary_new": b.get("canary_sec"),
        "canary_ratio": (
            round(b["canary_sec"] / a["canary_sec"], 4)
            if a.get("canary_sec") and b.get("canary_sec")
            else None
        ),
        "worst": sorted(
            ((q, qa[q], qb[q], round(ratios[q], 3)) for q in common),
            key=lambda t: -t[3],
        )[: args.top],
        "best": sorted(
            ((q, qa[q], qb[q], round(ratios[q], 3)) for q in common),
            key=lambda t: t[3],
        )[: args.top],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
