"""Probe-count scaling stress: collected vs distributed ANN search front.

The r11 claim under test: ann_index_topk (driver-collected probe
vectors — fine for interactive probe sets) degrades as the probe count
grows (collect + a 10k-row LUT literal shipped through createDataFrame
into the plan), while ann_index_topk_distributed (executor-side Arrow
LUT pass, driver sees only distinct cell ids) holds the per-probe cost
~flat. Both fronts share one numpy kernel and return identical frames,
so this is purely a WHERE-the-LUTs-are-computed experiment.

Method: one persisted index over the sf0.1 embeddings (built once,
outside timing); probe sets of 10 / 100 / 1k / 10k vectors synthesized
by replicating corpus vectors with per-copy scale factors (the bench
fixture's shape); per (front, count): 1 discarded warmup then median
of 3 timed noop-write runs in one JVM, distributed front timed FIRST
within each pair (JIT bias against the claim). Exclusive use of the
box — do not overlap with bench runs.

Usage: python tools/scale_stress_distprobe.py [sf_dir] > out.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from lakehouse_spark_spark.operators.annindex import (
        ann_index_topk,
        ann_index_topk_distributed,
        write_ann_index,
    )
    from lakehouse_spark_spark.session import get_session

    # the project session factory: AQE + Arrow on — the configs every
    # real consumer of these operators runs with (a bare session is ~6x
    # slower on the Arrow-batched LUT pass and mis-plans the ADC join)
    spark = get_session("distprobe-stress")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    n_corpus = emb.count()
    with tempfile.TemporaryDirectory(prefix="distprobe_idx_") as tmp:
        idx = write_ann_index(emb, "vec_id", "embedding", os.path.join(tmp, "idx"), n_cells=16)

        def probe_set(count: int):
            n_copies = max(1, count // n_corpus)
            # filter, NOT limit: limit() funnels the frame through one
            # partition and the single-partition checkpoint poisons the
            # downstream ADC join/window parallelism (measured 6x)
            base = emb.filter(F.col("vec_id") < min(count, n_corpus))
            return base.select(
                "vec_id", "embedding",
                F.explode(F.sequence(F.lit(0), F.lit(n_copies - 1))).alias("__j"),
            ).select(
                (F.col("vec_id") + F.col("__j") * F.lit(10_000_000)).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: x * (F.lit(1.0) + F.col("__j") / F.lit(1000.0))
                ).alias("embedding"),
            ).localCheckpoint(eager=True)

        def timed(fn, probes) -> list[float]:
            out = []
            for rep in range(4):  # rep 0 discarded (codegen warm)
                t0 = time.perf_counter()
                fn(idx, probes, "embedding", k=5, n_probe=4, shortlist=32).write.mode(
                    "overwrite"
                ).format("noop").save()
                if rep:
                    out.append(round(time.perf_counter() - t0, 3))
            return out

        results = []
        for count in (10, 100, 1_000, 10_000):
            probes = probe_set(count)
            n_probes = probes.count()
            dist = timed(ann_index_topk_distributed, probes)  # claimant first: JIT bias against it
            coll = timed(ann_index_topk, probes)
            results.append(
                {
                    "probes": n_probes,
                    "distributed_med_sec": statistics.median(dist),
                    "collected_med_sec": statistics.median(coll),
                    "distributed_reps": dist,
                    "collected_reps": coll,
                }
            )
            print(json.dumps(results[-1]), file=sys.stderr, flush=True)
        print(json.dumps({"sf_dir": sf_dir, "n_corpus": n_corpus, "results": results}))


if __name__ == "__main__":
    main()
