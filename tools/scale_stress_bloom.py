"""Scale-stress the Bloom-prefiltered incremental dedup one notch up.

The operator's scale contract (operators/bloom.py): the corpus-side
Bloom BUILD's shuffle is bounded by ``partitions x m/64`` rows — a
constant in corpus size — because ``bit_or`` partial-aggregates
map-side; the batch membership test shuffles slim (id, bool) rows; and
the corpus index itself is scanned but never shuffled (the verified
candidate set broadcasts INTO it as a semi-join). So at 10x corpus the
wall should grow far sub-linearly and the filter frame must stay at
most m/64 rows at BOTH scales, with an identical plan shape.

Round 9 additions:
- ``persisted`` runs: build the dedup index ONCE (the only corpus
  scan, timed as wall_index_build), then time ingest run 2 against the
  index alone — the O(batch + index) contract; run-2 wall must be well
  under the build-mode wall at the same scale because the wide corpus
  text is never re-read.
- ``cap`` run: m_bits = 1<<30 puts m/64 = 16 M words past the 8 M-word
  broadcast cap, so the probe join must plan as a shuffle join (zero
  BroadcastHashJoin on the filter) while the dedup aggregate stays
  identical to the m=1<<20 answer.

Reuses tools/scale_stress.synthesize's ~10x corpus. Usage:
    python tools/scale_stress_bloom.py [--base /root/testdata/sf0.1]
Prints one JSON line per scale plus a summary; paste into SCALE.md.
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

M_BITS = 1 << 20
M_BITS_OVER_CAP = 1 << 30  # 16M words > BROADCAST_CAP_WORDS (8M)

RUN_SNIPPET = """
import json, re, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from lakehouse_spark_spark.operators.bloom import (
    bloom_build, dedup_against_corpus_bloom, load_dedup_index, write_dedup_index)
from lakehouse_spark_spark.operators.dedup import content_hash

sf_dir, event_dir, m_bits, mode = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.dir", event_dir)
    .config("spark.sql.session.timeZone", "UTC")
    .appName("scale_stress_bloom")
    .getOrCreate()
)
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
batch = docs.filter(F.col("doc_id") % 7 == 0)
corpus = docs.filter(F.col("doc_id") % 7 != 0)

extra = {}
if mode == "persisted":
    import tempfile as _tf
    idx_path = _tf.mkdtemp(prefix="bloom_stress_idx_")
    t_idx = time.perf_counter()
    write_dedup_index(corpus, "text", idx_path, m_bits=m_bits)
    extra["wall_index_build_sec"] = round(time.perf_counter() - t_idx, 2)
    idx = load_dedup_index(spark, idx_path)
    t0 = time.perf_counter()
    out = dedup_against_corpus_bloom(batch, None, "doc_id", "text", index=idx)
else:
    t0 = time.perf_counter()
    out = dedup_against_corpus_bloom(batch, corpus, "doc_id", "text", m_bits=m_bits)
plan = out._jdf.queryExecution().executedPlan().toString()
shape = {
    "exchanges": len(re.findall(r"\\bExchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan)),
    "broadcasts": plan.count("BroadcastExchange"),
    "sort_merge_joins": plan.count("SortMergeJoin"),
    "broadcast_joins": plan.count("BroadcastHashJoin"),
}
agg = out.agg(
    F.count(F.lit(1)).alias("rows"),
    F.sum(F.col("dup_of_corpus").cast("long")).alias("dups_of_corpus"),
    F.sum(F.col("keep").cast("long")).alias("kept"),
).collect()[0]
wall = round(time.perf_counter() - t0, 2)
# the contract the stress pins: the materialized filter frame is
# <= m/64 rows no matter the corpus size
ch = corpus.select(content_hash("text").alias("content_hash")).distinct()
filter_rows = bloom_build(ch, "content_hash", m_bits=m_bits).count()
# probe-join shape, captured PRE-checkpoint (the dedup operator
# lineage-truncates `flagged`, hiding the probe join from its final
# plan string): over the 8M-word cap this must show ZERO broadcast
from lakehouse_spark_spark.operators.bloom import bloom_might_contain
bh = batch.select("doc_id", content_hash("text").alias("content_hash"))
probe = bloom_might_contain(
    bh, "content_hash", bloom_build(ch, "content_hash", m_bits=m_bits), m_bits=m_bits)
probe_plan = probe._jdf.queryExecution().executedPlan().toString()
# specifically the FILTER join (keyed on `word`) — the flag join back
# to the batch is free to broadcast either way
shape["probe_broadcast_joins"] = len(re.findall(r"BroadcastHashJoin \[word#", probe_plan))
shape["probe_shuffled_hash_joins"] = len(re.findall(r"ShuffledHashJoin \[word#", probe_plan))
print("RESULT " + json.dumps({
    "mode": mode, "m_bits": m_bits,
    "wall_sec": wall, "rows": agg["rows"], "dups_of_corpus": agg["dups_of_corpus"],
    "kept": agg["kept"], "filter_rows": filter_rows, "filter_rows_cap": m_bits // 64,
    "plan_shape": shape, **extra,
}), flush=True)
spark.stop()
"""


def run_one(sf_dir: str, label: str, m_bits: int = M_BITS, mode: str = "build") -> dict:
    event_dir = tempfile.mkdtemp(prefix=f"evlog_bloom_{label}_")
    out = subprocess.run(
        [sys.executable, "-c", RUN_SNIPPET, sf_dir, event_dir, str(m_bits), mode],
        capture_output=True, text=True, env=os.environ,
    )
    m = re.search(r"^RESULT (.*)$", out.stdout, re.M)
    if not m:
        raise RuntimeError(f"{label} run failed:\n{out.stderr[-3000:]}")
    rec = json.loads(m.group(1))
    rec.update(shuffle_bytes_from_eventlog(event_dir))
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
    r1 = run_one(args.base, "1x")
    r10 = run_one(args.workdir, f"{args.copies}x")
    # persisted-index ingest: run 2 consumes index + batch only
    p1 = run_one(args.base, "1x_persisted_run2", mode="persisted")
    p10 = run_one(args.workdir, f"{args.copies}x_persisted_run2", mode="persisted")
    # broadcast cap: m/64 = 16M words > 8M cap -> shuffle probe join
    c1 = run_one(args.base, "1x_over_cap", m_bits=M_BITS_OVER_CAP)
    summary = {
        "wall_growth_at_10x_data": round(r10["wall_sec"] / r1["wall_sec"], 2),
        "sub_linear": r10["wall_sec"] / r1["wall_sec"] < args.copies,
        "plan_shape_identical": r1["plan_shape"] == r10["plan_shape"],
        "filter_rows_capped_at_both_scales": (
            r1["filter_rows"] <= r1["filter_rows_cap"]
            and r10["filter_rows"] <= r10["filter_rows_cap"]
        ),
        "shuffle_write_growth": round(
            r10["shuffle_write_bytes"] / max(r1["shuffle_write_bytes"], 1), 2
        ),
        "persisted_run2_vs_build_1x": round(p1["wall_sec"] / r1["wall_sec"], 2),
        "persisted_run2_vs_build_10x": round(p10["wall_sec"] / r10["wall_sec"], 2),
        "persisted_answer_identical": all(
            p[k] == r[k]
            for p, r in ((p1, r1), (p10, r10))
            for k in ("rows", "dups_of_corpus", "kept")
        ),
        "under_cap_probe_broadcast_joins": r1["plan_shape"]["probe_broadcast_joins"],
        "over_cap_probe_broadcast_joins": c1["plan_shape"]["probe_broadcast_joins"],
        "over_cap_uses_shuffle_join": c1["plan_shape"]["probe_broadcast_joins"] == 0
        and c1["plan_shape"]["probe_shuffled_hash_joins"] >= 1,
        "over_cap_answer_identical": all(
            c1[k] == r1[k] for k in ("rows", "dups_of_corpus", "kept")
        ),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
