"""Scale-stress the round-10 persisted indexes two notches up (100x).

Contracts pinned (the bloom stress tool's discipline, applied to the
near-dup and ANN families):

- Near-dup (operators/neardup write/update/probe): with a FIXED batch
  and a scaling corpus, probing a PREBUILT MinHash-LSH index must grow
  far slower than the index-free baseline for the same batch-vs-corpus
  task (cross_batch_jaccard — it must re-shingle the corpus every
  run): probe is O(batch + index-scan), the baseline is O(corpus
  shingling + inverted-index join). The probe plan must contain zero
  scans of the corpus parquet.
- ANN (operators/annindex): searching a PREBUILT IVF-PQ index must cost
  a small fraction of the in-plan operator (which retrains codebooks
  and re-encodes the corpus every call), and the search must read ONLY
  the probed cell partitions' files (inputFiles ⊆ probed cells).

Ordering inside each fresh-JVM run is conservative: the index PROBE is
timed BEFORE the one-shot baseline, so JIT warm-up accrued during the
index build biases against the claim, not for it.

Usage:
    python tools/scale_stress_persisted_index.py [--base /root/testdata/sf0.1]
Prints one JSON line per run plus a summary; paste into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from tools.scale_stress import synthesize  # noqa: E402

NEARDUP_SNIPPET = """
import json, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from lakehouse_spark_spark.operators.neardup import (
    cross_batch_jaccard, load_neardup_index, neardup_candidates_against_index,
    write_neardup_index)

# argv: corpus_dir batch_dir — the BATCH is fixed (one ~700-doc slice
# of the base table, ids offset out of the corpus range) while the
# CORPUS scales, so probe growth isolates the O(index) term and the
# baseline growth shows the O(corpus) cost the index removes.
corpus_dir, batch_dir = sys.argv[1], sys.argv[2]
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("scale_stress_nd_index").getOrCreate()
)
corpus = spark.read.parquet(f"{corpus_dir}/documents.parquet").select("doc_id", "text")
batch = (
    spark.read.parquet(f"{batch_dir}/documents.parquet")
    .filter(F.col("doc_id") % 7 == 0)
    .select((F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text")
    .localCheckpoint(eager=True)  # pin: the batch must not vary between arms
)

idx_path = tempfile.mkdtemp(prefix="nd_stress_idx_")
t0 = time.perf_counter()
write_neardup_index(corpus, "doc_id", "text", idx_path)
wall_build = round(time.perf_counter() - t0, 2)

idx = load_neardup_index(spark, idx_path)
t0 = time.perf_counter()
probe = neardup_candidates_against_index(batch, idx, "doc_id", "text").filter(
    F.col("est_jaccard") >= 0.5)
n_probe_pairs = probe.count()
wall_probe = round(time.perf_counter() - t0, 2)
plan = probe._jdf.queryExecution().executedPlan().toString()

# the index-free baseline for the SAME task (batch-vs-corpus near-dup):
# exact cross-batch Jaccard — it must re-shingle the corpus every run
t0 = time.perf_counter()
baseline = cross_batch_jaccard(batch, corpus, "doc_id", "text", threshold=0.5)
n_baseline_pairs = baseline.count()
wall_baseline = round(time.perf_counter() - t0, 2)

print("RESULT " + json.dumps({
    "wall_index_build_sec": wall_build, "wall_probe_sec": wall_probe,
    "wall_indexfree_baseline_sec": wall_baseline,
    "probe_pairs": n_probe_pairs, "baseline_pairs": n_baseline_pairs,
    "probe_plan_scans_corpus": "documents.parquet" in plan,
}), flush=True)
spark.stop()
"""

ANN_SNIPPET = """
import json, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from lakehouse_spark_spark.operators.annindex import (
    ann_index_topk, load_ann_index, write_ann_index)
from lakehouse_spark_spark.operators.similarity import ivfpq_encode, ivfpq_topk, train_ivfpq

emb_path = sys.argv[1]
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("scale_stress_ann_index").getOrCreate()
)
emb = spark.read.parquet(emb_path).select("vec_id", "embedding")
probes = emb.filter(F.col("vec_id") < 4).localCheckpoint(eager=True)

idx_path = tempfile.mkdtemp(prefix="ann_stress_idx_")
t0 = time.perf_counter()
write_ann_index(emb, "vec_id", "embedding", idx_path, n_cells=16, m=8, k=16)
wall_build = round(time.perf_counter() - t0, 2)

idx = load_ann_index(spark, idx_path)
t0 = time.perf_counter()
search = ann_index_topk(idx, probes, "embedding", k=5, n_probe=2, shortlist=64)
n_search = search.count()
wall_search = round(time.perf_counter() - t0, 2)
# partition pruning: the cells scans' PartitionFilters name only the
# probed cells (inputFiles() ignores pruning — the plan is the signal)
import re as _re
plan = search._jdf.queryExecution().executedPlan().toString()
pfs = _re.findall(r"PartitionFilters: \\[cell#\\d+ IN \\(([^)]*)\\)", plan)
cells_read = sorted({int(x) for pf in pfs for x in pf.split(",")}) if pfs else list(range(16))

t0 = time.perf_counter()
cents, books = train_ivfpq(emb, "embedding", n_cells=16, m=8, k=16)
inline_index = ivfpq_encode(emb, "vec_id", "embedding", cents, books)
inline = ivfpq_topk(emb, inline_index, probes, "vec_id", "embedding", cents, books,
                    k=5, n_probe=2, shortlist=64)
n_inline = inline.count()
wall_inline = round(time.perf_counter() - t0, 2)

print("RESULT " + json.dumps({
    "wall_index_build_sec": wall_build, "wall_search_sec": wall_search,
    "wall_inline_sec": wall_inline, "search_rows": n_search,
    "inline_rows": n_inline, "cells_read": cells_read, "n_cells": 16,
}), flush=True)
spark.stop()
"""


def run_snippet(snippet: str, args: list[str] | str, label: str) -> dict:
    if isinstance(args, str):
        args = [args]
    out = subprocess.run(
        [sys.executable, "-c", snippet, *args], capture_output=True, text=True, env=os.environ
    )
    m = re.search(r"^RESULT (.*)$", out.stdout, re.M)
    if not m:
        raise RuntimeError(f"{label} run failed:\n{out.stderr[-3000:]}")
    rec = json.loads(m.group(1))
    rec["label"] = label
    print(json.dumps(rec), flush=True)
    return rec


def synthesize_embeddings(base_dir: str, out_path: str, copies: int = 10) -> None:
    """~copies x embeddings: copy 0 is the original; copy c>0 offsets
    ids and applies a deterministic per-element scale so the vectors
    are distinct but keep the clustered structure."""
    from pyspark.sql import functions as F

    from lakehouse_spark_spark.session import get_session

    spark = get_session("scale_stress_emb_gen")
    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet").select("vec_id", "embedding")
    n = emb.count()
    parts = []
    for c in range(copies):
        d = emb.select(
            (F.col("vec_id") + c * n * 10).alias("vec_id"),
            F.col("embedding") if c == 0 else F.transform(
                "embedding",
                lambda x, i: x * (1.0 + ((F.col("vec_id") + i + c) % 7 - 3) / 50.0),
            ).alias("embedding"),
        )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_path}/embeddings.parquet")
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    # 100x, not the bloom tool's 10x: at 10x (50k docs) local runs are
    # still stage-latency-bound and the O(corpus) term is invisible —
    # measured walls were flat; 100x (500k docs / vectors) separates
    # the curves cleanly.
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=100)
    ap.add_argument("--workdir", default="/tmp/scale_stress_100x")
    ap.add_argument("--emb-workdir", default="/tmp/scale_stress_emb_100x")
    args = ap.parse_args()
    if args.copies < 2:
        ap.error("--copies must be >= 2 (at 1 the summary's scaled keys would collide with the 1x baseline keys)")

    if not os.path.exists(f"{args.workdir}/documents.parquet"):
        synthesize(args.base, args.workdir, args.copies)
    if not os.path.exists(f"{args.emb_workdir}/embeddings.parquet"):
        synthesize_embeddings(args.base, args.emb_workdir, args.copies)

    nd1 = run_snippet(NEARDUP_SNIPPET, [args.base, args.base], "nd_1x")
    nd10 = run_snippet(NEARDUP_SNIPPET, [args.workdir, args.base], f"nd_{args.copies}x")
    ann1 = run_snippet(ANN_SNIPPET, [f"{args.base}/embeddings.parquet"], "ann_1x")
    ann10 = run_snippet(
        ANN_SNIPPET, [f"{args.emb_workdir}/embeddings.parquet"], f"ann_{args.copies}x"
    )

    X = f"{args.copies}x"  # summary keys carry the REAL scale measured
    summary = {
        "nd_probe_vs_indexfree_1x": round(
            nd1["wall_probe_sec"] / nd1["wall_indexfree_baseline_sec"], 2
        ),
        f"nd_probe_vs_indexfree_{X}": round(
            nd10["wall_probe_sec"] / nd10["wall_indexfree_baseline_sec"], 2
        ),
        f"nd_probe_growth_at_{X}_corpus_fixed_batch": round(
            nd10["wall_probe_sec"] / nd1["wall_probe_sec"], 2
        ),
        f"nd_indexfree_growth_at_{X}_corpus_fixed_batch": round(
            nd10["wall_indexfree_baseline_sec"] / nd1["wall_indexfree_baseline_sec"], 2
        ),
        "nd_probe_corpus_free_both_scales": not (
            nd1["probe_plan_scans_corpus"] or nd10["probe_plan_scans_corpus"]
        ),
        "ann_search_vs_inline_1x": round(ann1["wall_search_sec"] / ann1["wall_inline_sec"], 2),
        f"ann_search_vs_inline_{X}": round(ann10["wall_search_sec"] / ann10["wall_inline_sec"], 2),
        f"ann_search_growth_at_{X}": round(ann10["wall_search_sec"] / ann1["wall_search_sec"], 2),
        "ann_cells_read_bounded_both_scales": (
            len(ann1["cells_read"]) < ann1["n_cells"]
            and len(ann10["cells_read"]) < ann10["n_cells"]
        ),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
