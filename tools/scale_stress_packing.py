"""Scale-stress BFD sequence packing: the shard-parallelism contract.

pack_bins_bfd runs ONE greedy applyInPandas task per shard, so packing
parallelism is bounded by the shard-column cardinality — with
shard=source alone, a 20-source corpus uses 20 of 32 local cores (and
at 100 TB a petabyte source becomes one straggler task). The composite
source × hash-bucket shard key (curation_v5_ship's ``shard_buckets``)
multiplies the independent tasks while conserving docs/tokens exactly,
at a heuristic give-up of roughly one partial bin per extra bucket
(BFD carries no hard bound; this tool measures it against the
extra-shard count).

Measures pack wall at 1x and 10x documents for buckets ∈ {1, 16};
exits nonzero if conservation or the measured give-up bound fails, so
the tool doubles as a regression check. Reuses the bloom/span stress
10x synthesis. Usage:
    python tools/scale_stress_packing.py [--base /root/testdata/sf0.1]
Prints one JSON line per run plus a summary; paste into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from tools.scale_stress import synthesize  # noqa: E402

BUDGET = 2048

RUN_SNIPPET = """
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from lakehouse_spark_spark.operators.packing import pack_bins_bfd

sf_dir, buckets = sys.argv[1], int(sys.argv[2])
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("scale_stress_packing")
    .getOrCreate()
)
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
shard = (
    F.col("source") if buckets <= 1
    else F.concat_ws("_b", F.col("source"), F.pmod(F.xxhash64("doc_id"), F.lit(buckets)))
)
kept = docs.select(
    "doc_id", shard.alias("source"),
    F.size(F.split(F.trim("text"), r"\\s+")).cast("long").alias("n_tokens"),
)
t0 = time.perf_counter()
packed = pack_bins_bfd(kept, "doc_id", "n_tokens", %(budget)d, "source")
agg = packed.agg(
    F.count(F.lit(1)).alias("docs"),
    F.sum("n_tokens").alias("tokens"),
    F.count_distinct("shard", "bin_id").alias("bins"),
    F.count_distinct("shard").alias("shards"),
).collect()[0]
wall = round(time.perf_counter() - t0, 2)
print("RESULT " + json.dumps({
    "buckets": buckets, "wall_sec": wall, "docs": agg["docs"],
    "tokens": agg["tokens"], "bins": agg["bins"], "shards": agg["shards"],
}), flush=True)
spark.stop()
""" % {"budget": BUDGET}


def run_one(sf_dir: str, label: str, buckets: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUN_SNIPPET, sf_dir, str(buckets)],
        capture_output=True, text=True, env=os.environ,
    )
    m = re.search(r"^RESULT (.*)$", out.stdout, re.M)
    if not m:
        raise RuntimeError(f"{label} run failed:\n{out.stderr[-3000:]}")
    rec = json.loads(m.group(1))
    rec["label"] = label
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--workdir", default="/tmp/scale_stress_10x")
    args = ap.parse_args()

    if not os.path.exists(f"{args.workdir}/documents.parquet"):
        synthesize(args.base, args.workdir, args.copies)
    f1 = run_one(args.base, "1x_flat", 1)
    b1 = run_one(args.base, "1x_b16", 16)
    f10 = run_one(args.workdir, f"{args.copies}x_flat", 1)
    b10 = run_one(args.workdir, f"{args.copies}x_b16", 16)
    summary = {
        "conserved_1x": (f1["docs"], f1["tokens"]) == (b1["docs"], b1["tokens"]),
        "conserved_10x": (f10["docs"], f10["tokens"]) == (b10["docs"], b10["tokens"]),
        "flat_wall_growth_10x": round(f10["wall_sec"] / f1["wall_sec"], 2),
        "bucketed_wall_growth_10x": round(b10["wall_sec"] / b1["wall_sec"], 2),
        "bucketed_vs_flat_10x": round(b10["wall_sec"] / f10["wall_sec"], 2),
        "extra_bins_10x": b10["bins"] - f10["bins"],
        "extra_bins_bound_10x": b10["shards"] - f10["shards"],
        "shards": {"flat": f10["shards"], "b16": b10["shards"]},
    }
    summary["extra_bins_within_bound"] = (
        summary["extra_bins_10x"] <= summary["extra_bins_bound_10x"]
    )
    print(json.dumps(summary))
    if not (
        summary["conserved_1x"]
        and summary["conserved_10x"]
        and summary["extra_bins_within_bound"]
    ):
        sys.exit(1)


if __name__ == "__main__":
    main()
