"""Corpus-growth scaling stress: single-block vs block-PAIR Hamming join.

The ONE candidate join behind all four modality dedup stories (text
SimHash, image dHash/pHash, audio afp64, video frame-vote) splits the
64-bit fingerprint into ``blocks`` equal blocks and equi-joins on any
agreeing block. The scale seam this stress measures: at blocks=8 the
block-value space is only 2^8 = 256, so for organic (near-uniform)
fingerprints bucket sizes grow LINEARLY with the corpus and the join
output grows ~n²·blocks/2^width — quadratic with a small constant.
Fine at 10^5-10^6 fingerprints; a scale-killer at web scale.

``block_pairs=True`` (r12; the Manku/Jain/Sarma WWW'07 multi-table
shape) joins on every PAIR of blocks agreeing: same filtered output
for max_hamming <= blocks-2 (pinned by test), value space squared to
2^16, ~18x smaller quadratic constant bought for a 3.5x wider explode.

Method: corpora of uniform random 63-bit fingerprints (spark.range +
xxhash64 bits — driver-free, seeded) with a 5% planted-twin fraction
flipped at EXACTLY the radius (hamming 6 — the hardest catchable
twin). Per (mode, size): candidates counted once (planted recall
asserted complete), then 1 discarded warmup + median of 3 timed
noop-write runs in one JVM. Single-block mode stops at 120k (its
candidate set is ~n²/32 — the 480k run would materialize ~7e9 pairs,
which is the point); pair mode runs to 480k. Exclusive use of the box.

``--skewed`` (r13) runs the distribution the uniform stress CANNOT
exhibit — the one the r12 verdict flagged: real media is pathologically
skewed (solid-color/black frames, silence, letterbox bars fingerprint
IDENTICALLY by the million), one (block, value) bucket holds the whole
cluster, and the unguarded join materializes its SQUARE. Method: an
organic uniform corpus + planted radius twins PLUS a single repeated
"flat frame" fingerprint cluster. Uncapped runs only at small cluster
sizes (the 2k cluster already emits ~2M pair rows from 2k docs);
``max_bucket`` runs to a 200k cluster and asserts candidates collapse
to the O(cluster) rescue star with organic planted recall intact.

Usage: python tools/scale_stress_hamming.py [--skewed] > out.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fingerprints(spark, n: int, max_hamming: int):
    from pyspark.sql import functions as F

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (
            F.shiftleft(F.abs(F.xxhash64(F.col("id"), F.lit("hi"))) % F.lit(2**31), 32)
            + F.abs(F.xxhash64(F.col("id"), F.lit("lo"))) % F.lit(2**32)
        ).alias("simhash"),
    )
    twin_src = base.filter(F.col("doc_id") % 20 == 0)
    flipped = twin_src.select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
        F.aggregate(
            F.slice(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(29)),
                        lambda i: F.abs(F.xxhash64(F.col("doc_id"), i)) % 63,
                    )
                ),
                1,
                max_hamming,
            ),
            F.col("simhash"),
            # shiftleft needs a LITERAL count; pow(2, pos) is exact in
            # double for pos <= 62 (powers of two) so the cast is safe
            lambda acc, pos: acc.bitwiseXOR(F.pow(F.lit(2.0), pos.cast("double")).cast("long")),
        ).alias("simhash"),
    )
    return base.unionByName(flipped).repartition(32).localCheckpoint(eager=True)


def main() -> None:
    from pyspark.sql import functions as F

    from lakehouse_spark_spark.operators.neardup import simhash_candidates
    from lakehouse_spark_spark.session import get_session

    spark = get_session("hamming-stress")
    spark.sparkContext.setLogLevel("ERROR")
    max_hamming, blocks = 6, 8
    results = []
    for n in (120_000, 480_000, 1_920_000):
        fp = _fingerprints(spark, n, max_hamming)
        n_rows = fp.count()
        for mode in ("single", "pairs"):
            if mode == "single" and n > 480_000:
                continue  # ~64e9 intermediate pairs (~70 s/run): the
                # seam itself — measured once in SCALE.md, skipped here
            kw = dict(max_hamming=max_hamming, blocks=blocks, materialize=False,
                      block_pairs=(mode == "pairs"))
            cand = simhash_candidates(fp, "doc_id", **kw)
            n_cand = cand.count()
            n_planted = cand.filter(F.col("id_b") - F.col("id_a") == 1_000_000_000).count()
            assert n_planted == n // 20, (mode, n, n_planted)  # complete recall
            times = []
            for rep in range(4):
                t0 = time.monotonic()
                simhash_candidates(fp, "doc_id", **kw).write.mode("overwrite").format("noop").save()
                dt = time.monotonic() - t0
                if rep:
                    times.append(dt)
            results.append(
                {
                    "mode": mode,
                    "n_fingerprints": n_rows,
                    "candidates": n_cand,
                    "planted_pairs": n_planted,
                    "median_sec": round(statistics.median(times), 3),
                }
            )
            print(json.dumps(results[-1]), file=sys.stderr, flush=True)
        fp.unpersist()
    print(json.dumps({"max_hamming": max_hamming, "blocks": blocks, "results": results}))


def main_skewed() -> None:
    from pyspark.sql import functions as F

    from lakehouse_spark_spark.operators.neardup import simhash_candidates
    from lakehouse_spark_spark.session import get_session

    spark = get_session("hamming-stress-skewed")
    spark.sparkContext.setLogLevel("ERROR")
    max_hamming, blocks, organic, flat = 6, 8, 100_000, 0x155555555555555
    results = []
    for cluster, modes in ((2_000, ("uncapped", "capped")), (200_000, ("capped",))):
        fp = _fingerprints(spark, organic, max_hamming)
        cl = spark.range(cluster).select(
            (F.col("id") + 2_000_000_000).alias("doc_id"),
            F.lit(flat).cast("long").alias("simhash"),
        )
        fp = fp.unionByName(cl).repartition(32).localCheckpoint(eager=True)
        for mode in modes:
            kw = dict(
                max_hamming=max_hamming, blocks=blocks, materialize=False,
                block_pairs=False, max_bucket=(1_000 if mode == "capped" else None),
            )
            t0 = time.monotonic()
            cand = simhash_candidates(fp, "doc_id", **kw).localCheckpoint(eager=True)
            n_cand = cand.count()
            dt = time.monotonic() - t0
            star = cand.filter(
                (F.col("id_a") == 2_000_000_000) & (F.col("id_b") > 2_000_000_000)
            ).count()
            in_cluster = cand.filter(F.col("id_b") > 2_000_000_000).count()
            planted = cand.filter(
                (F.col("id_b") - F.col("id_a") == 1_000_000_000) & (F.col("id_b") < 2_000_000_000)
            ).count()
            assert planted == organic // 20, (mode, cluster, planted)
            if mode == "capped":
                # the whole cluster collapses to the rescue star: every
                # member pairs with the minimum, nothing pairs otherwise
                assert star == cluster - 1 and in_cluster == cluster - 1, (star, in_cluster)
            results.append(
                {
                    "mode": mode, "cluster": cluster, "organic": organic,
                    "candidates": n_cand, "cluster_pairs": in_cluster,
                    "rescue_star": star, "planted_pairs": planted,
                    "sec": round(dt, 3),
                }
            )
            print(json.dumps(results[-1]), file=sys.stderr, flush=True)
            cand.unpersist()
        fp.unpersist()
    print(json.dumps({"max_hamming": max_hamming, "blocks": blocks, "skewed": results}))


if __name__ == "__main__":
    if "--skewed" in sys.argv[1:]:
        main_skewed()
    else:
        main()
