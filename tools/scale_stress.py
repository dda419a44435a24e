"""Scale-stress the composed corpus pipeline one notch up.

Synthesizes a ~10x copy of sf0.1 documents with CONTROLLED duplicate
structure (per original doc: 1 exact copy for 10% of docs, 1 light
near-dup mutation for a different 10%, and 7 heavy mutations that fall
well below the Jaccard threshold), then runs prepare_corpus
(minhash backend + cluster drop policy) at 1x and 10x in fresh
sessions, recording wall time, the physical plan shape (Exchange /
broadcast counts — must be IDENTICAL across scales), and total shuffle
read/write bytes parsed from the Spark event log.

Usage: python tools/scale_stress.py [--base /root/testdata/sf0.1]
Prints one JSON line per scale plus a summary; paste into SCALE.md.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def synthesize(base_dir: str, out_path: str, copies: int = 10) -> None:
    """Write a ~copies x documents table derived from base documents.

    Deterministic per (doc_id, copy): copy 0 is the original; copy 1 is
    an EXACT copy when doc_id%10==0 and a LIGHT mutation (~2% of words
    swapped -> 3-gram Jaccard ~0.94, above the 0.8 threshold) when
    doc_id%10==1; all other copies mutate ~35% of words (Jaccard ~0.27,
    safely below threshold) so they are genuinely distinct documents.
    """
    from pyspark.sql import functions as F

    from lakehouse_spark_spark.session import get_session
    from lakehouse_spark_spark.sources.loaders import load_table

    spark = get_session("scale_stress_gen")
    docs = load_table(spark, base_dir, "documents")
    n_base = docs.count()
    out = []
    for c in range(copies):
        d = docs.withColumn("copy", F.lit(c))
        if c == 0:
            mutated = d.withColumn("new_text", F.col("text"))
        else:
            # per-word deterministic mutation: replace word i with a
            # copy-specific token when xxhash64(doc_id, i, copy) % 100 < rate
            rate = (
                F.when(F.lit(c) == 1, F.when(F.col("doc_id") % 10 == 0, F.lit(0)).when(F.col("doc_id") % 10 == 1, F.lit(2)).otherwise(F.lit(35)))
                .otherwise(F.lit(35))
            )
            words = F.split(F.col("text"), " ")
            mutated_words = F.zip_with(
                words,
                F.sequence(F.lit(1), F.size(words)),
                lambda w, i: F.when(
                    F.pmod(F.xxhash64(F.col("doc_id"), i, F.col("copy")), 100) < rate, F.concat(F.lit("zq"), i)
                ).otherwise(w),
            )
            mutated = d.withColumn("new_text", F.array_join(mutated_words, " "))
        out.append(
            mutated.select(
                (F.col("doc_id") + F.lit(c) * F.lit(10_000_000)).alias("doc_id"),
                F.col("new_text").alias("text"),
                "lang",
                "source",
                F.length("new_text").alias("n_chars"),
            )
        )
    big = out[0]
    for o in out[1:]:
        big = big.unionByName(o)
    big.repartition(32).write.mode("overwrite").parquet(f"{out_path}/documents.parquet")
    n = spark.read.parquet(f"{out_path}/documents.parquet").count()
    print(f"synthesized {n} docs ({copies}x {n_base}) -> {out_path}", flush=True)
    spark.stop()


RUN_SNIPPET = r"""
import json, sys, time, re
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from lakehouse_spark_spark.plans.corpus import curation_v3, prepare_corpus

sf_dir, event_dir = sys.argv[1], sys.argv[2]
pipeline = sys.argv[3] if len(sys.argv) > 3 else "prepare_corpus"
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.dir", event_dir)
    .config("spark.sql.session.timeZone", "UTC")
    .appName("scale_stress_run")
    .getOrCreate()
)
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
# t0 BEFORE the pipeline call: iterative stages (connected components)
# and lazy checkpoints execute real work during plan construction
t0 = time.perf_counter()
if pipeline == "curation_v3":
    out = curation_v3(docs, neardup_backend="minhash")
    plan = out._jdf.queryExecution().executedPlan().toString()
    counts = {r["disposition"]: r["n_docs"] for r in out.collect()}
else:
    disp = prepare_corpus(docs, jaccard_threshold=0.8, neardup_backend="minhash", drop_policy="cluster")
    plan = disp._jdf.queryExecution().executedPlan().toString()
    counts = {r["verdict"]: r["n"] for r in disp.groupBy("verdict").agg(F.count(F.lit(1)).alias("n")).collect()}
shape = {
    "exchanges": len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan)),
    "broadcasts": plan.count("BroadcastExchange"),
    "sort_merge_joins": plan.count("SortMergeJoin"),
    "broadcast_joins": plan.count("BroadcastHashJoin"),
}
wall = round(time.perf_counter() - t0, 2)
print("RESULT " + json.dumps({"wall_sec": wall, "verdicts": counts, "plan_shape": shape}), flush=True)
spark.stop()
"""


def shuffle_bytes_from_eventlog(event_dir: str) -> dict[str, int]:
    rd = wr = 0
    files = [p for p in glob.glob(f"{event_dir}/**", recursive=True) if os.path.isfile(p)]
    for p in files:
        if os.path.basename(p).startswith("appstatus"):
            continue
        opener = gzip.open if p.endswith(".gz") else open
        with opener(p, "rt", errors="replace") as f:
            for line in f:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                ev = json.loads(line)
                m = ev.get("Task Metrics") or {}
                wr += ((m.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written")) or 0
                srm = m.get("Shuffle Read Metrics") or {}
                rd += (srm.get("Local Bytes Read") or 0) + (srm.get("Remote Bytes Read") or 0)
    return {"shuffle_read_bytes": rd, "shuffle_write_bytes": wr}


def run_scale(sf_dir: str, label: str, pipeline: str = "prepare_corpus") -> dict:
    event_dir = tempfile.mkdtemp(prefix=f"evlog_{label}_")
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-c", RUN_SNIPPET, sf_dir, event_dir, pipeline],
        capture_output=True, text=True, env=os.environ,
    )
    total = round(time.perf_counter() - t0, 2)
    m = re.search(r"^RESULT (.*)$", out.stdout, re.M)
    if not m:
        raise RuntimeError(f"{label} run failed:\n{out.stderr[-3000:]}")
    rec = json.loads(m.group(1))
    rec.update(shuffle_bytes_from_eventlog(event_dir))
    rec["label"] = label
    rec["proc_wall_sec_incl_startup"] = total
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--workdir", default="/tmp/scale_stress_10x")
    ap.add_argument("--pipeline", default="prepare_corpus", choices=["prepare_corpus", "curation_v3"])
    args = ap.parse_args()

    if not os.path.exists(f"{args.workdir}/documents.parquet"):
        synthesize(args.base, args.workdir, args.copies)
    r1 = run_scale(args.base, "1x", args.pipeline)
    r10 = run_scale(args.workdir, f"{args.copies}x", args.pipeline)
    growth = round(r10["wall_sec"] / r1["wall_sec"], 2)
    same_plan = r1["plan_shape"] == r10["plan_shape"]
    print(
        json.dumps(
            {
                "wall_growth_at_10x_data": growth,
                "sub_linear": growth < args.copies,
                "plan_shape_identical": same_plan,
            }
        )
    )


if __name__ == "__main__":
    main()
