"""Scale-stress the ITERATIVE/GRAPH family one notch up (round-4
verdict ask #4): supplier-style PageRank and connected components at 1x
and ~10x edges, in fresh sessions with event logs, recording wall time,
total shuffle bytes, and plan-shape stability (Exchange / broadcast /
join counts of the final iteration's executed plan must be IDENTICAL
across scales — the loop's per-round shape is data-independent by
construction, this verifies it).

Workloads:

- pagerank: the real supplier_pagerank edge set (distinct
  customer->supplier pairs from sf0.1 orders x lineitem), scaled 10x as
  10 DISJOINT node-offset copies — same degree distribution and
  iteration count, 10x the rows, so ideal scaling is linear wall and
  ~linear shuffle bytes.
- components: synthesized chain graph (``--chains`` chains of length 6
  => 5 edges each), scaled 10x by chain count. Pointer jumping needs
  ceil(log2(chain length)) rounds at ANY scale, so wall growth isolates
  the per-round shuffle cost, not extra rounds.

Usage: python tools/scale_stress_graph.py [--base /root/testdata/sf0.1]
Prints one JSON line per (workload, scale) plus a summary; paste into
SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from tools.scale_stress import shuffle_bytes_from_eventlog  # noqa: E402

RUN_SNIPPET = r"""
import json, sys, time, re
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

workload, scale, base_dir, event_dir, chains = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4], int(sys.argv[5])
)
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.dir", event_dir)
    .config("spark.sql.session.timeZone", "UTC")
    .appName("scale_stress_graph")
    .getOrCreate()
)

if workload == "pagerank":
    from lakehouse_spark_spark.operators.graph import pagerank
    from lakehouse_spark_spark.sources.loaders import load_table

    orders = load_table(spark, base_dir, "orders")
    li = load_table(spark, base_dir, "lineitem")
    base_edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(1000000000000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    parts = [
        base_edges.select(
            (F.col("src") + F.lit(c * 100_000_000)).alias("src"),
            (F.col("dst") + F.lit(c * 100_000_000)).alias("dst"),
        )
        for c in range(scale)
    ]
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    edges = edges.repartition(32).localCheckpoint()  # freeze input; time the operator
    n_edges = edges.count()
    t0 = time.perf_counter()
    out = pagerank(edges, "src", "dst", iterations=5)
    n_out = out.count()
    wall = round(time.perf_counter() - t0, 2)
    # per-iteration plan shape: the operator checkpoints each round, so
    # the OUTPUT plan is lineage-truncated; mirror one round's body on
    # the frozen inputs (identical expressions to operators/graph.py)
    # and capture THAT plan — the shape every iteration executes.
    out_deg = edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("out_degree"))
    edges_deg = edges.join(out_deg.withColumnRenamed("node", "src"), "src")
    nodes = edges.select(F.col("src").alias("node")).union(edges.select(F.col("dst").alias("node"))).distinct()
    ranks = nodes.select("node", F.lit(10**9).cast("bigint").alias("rank_units"))
    contribs = edges_deg.join(ranks.withColumnRenamed("node", "src"), "src").select(
        F.col("dst").alias("node"),
        F.expr("(17 * rank_units + 10 * out_degree) div (20 * out_degree)").alias("contrib"),
    )
    round_df = nodes.join(contribs.groupBy("node").agg(F.sum("contrib").alias("in_rank")), "node", "left")
    plan = round_df._jdf.queryExecution().executedPlan().toString()
else:
    from lakehouse_spark_spark.operators.graph import connected_components

    # chain graph: chains * scale chains of 6 nodes (5 edges each)
    n_chains = chains * scale
    ids = spark.range(n_chains * 5).select(
        F.floor(F.col("id") / 5).alias("chain"), (F.col("id") % 5).alias("pos")
    )
    edges = ids.select(
        (F.col("chain") * 10 + F.col("pos")).alias("src"),
        (F.col("chain") * 10 + F.col("pos") + 1).alias("dst"),
    )
    edges = edges.repartition(32).localCheckpoint()
    n_edges = edges.count()
    t0 = time.perf_counter()
    out = connected_components(edges, src="src", dst="dst")
    n_out = out.count()
    wall = round(time.perf_counter() - t0, 2)
    # correctness at scale: every chain collapses to its min node id
    n_comp = out.select("component").distinct().count()
    assert n_comp == n_chains, (n_comp, n_chains)
    # mirror one pointer-jumping round (operators/graph.py loop body)
    # on the frozen inputs for the per-iteration plan shape
    sym = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).union(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    ).distinct()
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn("component", F.col("node"))
    neigh_min = (
        sym.join(labels, sym["u"] == labels["node"])
        .select(F.col("v").alias("node"), F.col("component").alias("nmin"))
        .groupBy("node").agg(F.min("nmin").alias("nmin"))
    )
    relaxed = labels.join(neigh_min, "node", "left").select(
        "node", F.least(F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))).alias("component")
    )
    parents = relaxed.select(F.col("node").alias("pnode"), F.col("component").alias("pcomp"))
    jumped = relaxed.join(parents, relaxed["component"] == parents["pnode"], "left").select(
        "node", F.least(F.col("component"), F.coalesce(F.col("pcomp"), F.col("component"))).alias("component")
    )
    plan = jumped._jdf.queryExecution().executedPlan().toString()

shape = {
    "exchanges": len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan)),
    "broadcasts": plan.count("BroadcastExchange"),
    "sort_merge_joins": plan.count("SortMergeJoin"),
    "broadcast_joins": plan.count("BroadcastHashJoin"),
}
print("RESULT " + json.dumps({
    "wall_sec": wall, "n_edges": n_edges, "n_out": n_out, "plan_shape": shape,
}), flush=True)
spark.stop()
"""


def run_one(workload: str, scale: int, base: str, chains: int) -> dict:
    event_dir = tempfile.mkdtemp(prefix=f"evlog_graph_{workload}_{scale}x_")
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-c", RUN_SNIPPET, workload, str(scale), base, event_dir, str(chains)],
        capture_output=True, text=True, env=os.environ,
    )
    total = round(time.perf_counter() - t0, 2)
    m = re.search(r"^RESULT (.*)$", out.stdout, re.M)
    if not m:
        raise RuntimeError(f"{workload} {scale}x failed:\n{out.stderr[-3000:]}")
    rec = json.loads(m.group(1))
    rec.update(shuffle_bytes_from_eventlog(event_dir))
    rec["label"] = f"{workload}_{scale}x"
    rec["proc_wall_sec_incl_startup"] = total
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--chains", type=int, default=50_000)
    args = ap.parse_args()

    summary = {}
    for workload in ("pagerank", "components"):
        r1 = run_one(workload, 1, args.base, args.chains)
        r10 = run_one(workload, args.copies, args.base, args.chains)
        joins1 = r1["plan_shape"]["sort_merge_joins"] + r1["plan_shape"]["broadcast_joins"]
        joins10 = r10["plan_shape"]["sort_merge_joins"] + r10["plan_shape"]["broadcast_joins"]
        summary[workload] = {
            "wall_growth_at_10x_data": round(r10["wall_sec"] / r1["wall_sec"], 2),
            "sub_linear": r10["wall_sec"] / r1["wall_sec"] < args.copies,
            "plan_shape_identical": r1["plan_shape"] == r10["plan_shape"],
            # AQE may flip broadcast<->sort-merge as side sizes cross the
            # threshold — the LOGICAL round shape (join count) must hold
            "plan_join_count_identical": joins1 == joins10,
            "shuffle_write_growth": round(
                r10["shuffle_write_bytes"] / max(r1["shuffle_write_bytes"], 1), 2
            ),
        }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
