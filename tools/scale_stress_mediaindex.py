"""Probe-geometry scaling stress for the persisted media-fingerprint
index: single-block vs Manku pair-key tables (r13).

The seam this measures: a single-block index probe equi-joins batch
blocks against corpus blocks over a value space of only
blocks·2^(64/blocks) (2,048 buckets at 8 blocks), so candidate rows
between UNRELATED fingerprints grow ~|batch|·|index|·blocks/2^width —
at a 10^9-fingerprint index and 10^6-probe batch that is ~10^13 rows
before the Hamming filter. The pair-key geometry squares the value
space (2^16 per block pair): ~|batch|·|index|·C(blocks,2)/2^(2·width),
a 2^width/((blocks-1)/2) ≈ 73× smaller constant at blocks=8, bought
for a C(blocks,2)/blocks = 3.5× larger persisted block table.

Method: corpus of uniform random 62-bit fingerprints folded into BOTH
geometries (same fingerprints, same manifest protocol); probe batches
with a planted radius-(blocks-2) twin fraction (complete recall in
both geometries — asserted). Per (geometry, size): candidate count
once, then 1 discarded warmup + median of 3 timed noop-write probe
runs in one JVM. Single-block stops where its candidate row count
crosses ~10^9 (the seam itself — projected, not run). Exclusive box.

Usage: python tools/scale_stress_mediaindex.py > out.json
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fps(spark, n: int, offset: int, twin_of=None, twin_dist: int = 6):
    """n uniform random fingerprints with ids offset.. ; with twin_of
    (another fps frame), 5% of rows are planted twins of its rows at
    EXACTLY twin_dist (ids + 1_000_000_000)."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(
        (F.col("id") + offset).alias("doc_id"),
        (
            F.shiftleft(F.abs(F.xxhash64(F.col("id") + offset, F.lit("hi"))) % F.lit(2**30), 32)
            + F.abs(F.xxhash64(F.col("id") + offset, F.lit("lo"))) % F.lit(2**32)
        ).alias("fp"),
    )
    if twin_of is None:
        return base
    twin_src = twin_of.filter(F.col("doc_id") % 20 == 0)
    flipped = twin_src.select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
        F.aggregate(
            F.slice(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(29)),
                        lambda i: F.abs(F.xxhash64(F.col("doc_id"), i)) % 62,
                    )
                ),
                1,
                twin_dist,
            ),
            F.col("fp"),
            lambda acc, pos: acc.bitwiseXOR(F.pow(F.lit(2.0), pos.cast("double")).cast("long")),
        ).alias("fp"),
    )
    return base.unionByName(flipped)


def main() -> None:
    from pyspark.sql import functions as F

    from lakehouse_spark_spark.operators.mediaindex import (
        load_media_fp_index,
        media_candidates_against_index,
        write_media_fp_index,
    )
    from lakehouse_spark_spark.session import get_session

    spark = get_session("mediaindex-stress")
    spark.sparkContext.setLogLevel("ERROR")
    blocks, max_hamming = 8, 6
    results = []
    root = tempfile.mkdtemp(prefix="mediaidx_stress_")
    try:
        for n_corpus, n_batch in (
            (125_000, 12_500), (250_000, 25_000), (500_000, 50_000), (2_000_000, 100_000)
        ):
            corpus = _fps(spark, n_corpus, 0).repartition(32).localCheckpoint(eager=True)
            batch = (
                _fps(spark, n_batch, 10_000_000, twin_of=corpus)
                .repartition(32)
                .localCheckpoint(eager=True)
            )
            n_twins = batch.filter(F.col("doc_id") >= 1_000_000_000).count()
            for geom in ("single", "pair"):
                # projected single-block candidate rate: |batch|*|index|*blocks/2^width
                # (measured: the 7.8e8-row 500k/50k single run GC-thrashes a
                # 128 GiB local JVM — the seam is real; skip past 2e8 and
                # record the projection instead)
                proj = n_batch * n_corpus * blocks / 2 ** (64 // blocks)
                if geom == "single" and proj > 2e8:
                    results.append(
                        {"geometry": geom, "index": n_corpus, "batch": n_batch,
                         "projected_candidates": int(proj), "skipped": True}
                    )
                    print(json.dumps(results[-1]), file=sys.stderr, flush=True)
                    continue
                path = os.path.join(root, f"{geom}_{n_corpus}")
                write_media_fp_index(
                    corpus, "doc_id", "fp", path, blocks=blocks, pair_blocks=(geom == "pair")
                )
                idx = load_media_fp_index(spark, path)
                out = media_candidates_against_index(
                    batch, idx, "doc_id", "fp", max_hamming=max_hamming
                )
                n_cand = out.count()
                planted = out.filter(
                    F.col("new_id") - F.col("corpus_id") == 1_000_000_000
                ).count()
                assert planted == n_twins, (geom, n_corpus, planted, n_twins)
                times = []
                for rep in range(4):
                    t0 = time.monotonic()
                    media_candidates_against_index(
                        batch, idx, "doc_id", "fp", max_hamming=max_hamming
                    ).write.mode("overwrite").format("noop").save()
                    dt = time.monotonic() - t0
                    if rep:
                        times.append(dt)
                results.append(
                    {"geometry": geom, "index": n_corpus, "batch": n_batch,
                     "candidates": n_cand, "planted": planted,
                     "median_sec": round(statistics.median(times), 3)}
                )
                print(json.dumps(results[-1]), file=sys.stderr, flush=True)
            corpus.unpersist()
            batch.unpersist()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"blocks": blocks, "max_hamming": max_hamming, "results": results}))


if __name__ == "__main__":
    main()
