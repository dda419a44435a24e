"""Scale-stress the round-3 heavy LM/retrieval operators one notch up
(round-3 verdict ask #5): doc_trigram_logprob_interp and
tfidf_cosine_pairs_blocked at 1x vs ~10x documents.

Reuses tools/scale_stress.synthesize's ~10x corpus (exact copies +
mutations). The exact copies are the adversarial case for BOTH ops:
every trigram's count multiplies (vocabulary tables stay the same SIZE
but every conditional-count shuffle row carries 10x weight), and the
TF-IDF inverted index gets 10x postings per term, so the posting-list
self-join quadruples-plus in candidate volume.

Runs each op at each scale in a FRESH JVM, records wall, plan shape
(must be identical across scales), and shuffle bytes from the event
log. Usage: python tools/scale_stress_lm.py [--base /root/testdata/sf0.1]
Prints one JSON line per (op, scale) + a summary; paste into SCALE.md.
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

from tools.scale_stress import shuffle_bytes_from_eventlog, synthesize  # noqa: E402

RUN_SNIPPET = """
import json, re, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from lakehouse_spark_spark.plans.queries import registry

sf_dir, event_dir, op = sys.argv[1], sys.argv[2], sys.argv[3]
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.dir", event_dir)
    .config("spark.sql.session.timeZone", "UTC")
    .appName("scale_stress_lm")
    .getOrCreate()
)
q = registry()[op]
t0 = time.perf_counter()
out = q.builder(spark, sf_dir)
plan = out._jdf.queryExecution().executedPlan().toString()
shape = {
    "exchanges": len(re.findall(r"\\bExchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan)),
    "broadcasts": plan.count("BroadcastExchange"),
    "sort_merge_joins": plan.count("SortMergeJoin"),
    "broadcast_joins": plan.count("BroadcastHashJoin"),
}
out.write.mode("overwrite").format("noop").save()
wall = round(time.perf_counter() - t0, 2)
print("RESULT " + json.dumps({"wall_sec": wall, "plan_shape": shape}), flush=True)
spark.stop()
"""

OPS = ("doc_trigram_logprob_interp", "tfidf_cosine_pairs_blocked")


def run_one(sf_dir: str, label: str, op: str) -> dict:
    event_dir = tempfile.mkdtemp(prefix=f"evlog_lm_{label}_{op}_")
    out = subprocess.run(
        [sys.executable, "-c", RUN_SNIPPET, sf_dir, event_dir, op],
        capture_output=True, text=True, env=os.environ,
    )
    m = re.search(r"^RESULT (.*)$", out.stdout, re.M)
    if not m:
        raise RuntimeError(f"{label}/{op} run failed:\n{out.stderr[-3000:]}")
    rec = json.loads(m.group(1))
    rec.update(shuffle_bytes_from_eventlog(event_dir))
    rec["label"], rec["op"] = label, op
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
    summary = {}
    for op in OPS:
        r1 = run_one(args.base, "1x", op)
        r10 = run_one(args.workdir, f"{args.copies}x", op)
        summary[op] = {
            "wall_growth_at_10x_data": round(r10["wall_sec"] / r1["wall_sec"], 2),
            "sub_linear": r10["wall_sec"] / r1["wall_sec"] < args.copies,
            "plan_shape_identical": r1["plan_shape"] == r10["plan_shape"],
            "shuffle_write_growth": round(
                r10["shuffle_write_bytes"] / max(r1["shuffle_write_bytes"], 1), 2
            ),
        }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
