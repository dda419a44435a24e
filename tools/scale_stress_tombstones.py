"""Tombstone-overhead stress (r14): what does the deletion protocol
COST at scale? The tombstone anti-join rides every probe of an index
that has deletions, so the number that matters is probe latency as the
ledger grows — from the common case (a handful of takedowns) to the
pathological one (half the corpus deleted and never compacted).

Method: a persisted media-fingerprint index over 2M uniform
fingerprints with 100k planted radius-6 twins probed by a 100k batch
(the BENCH_MEDIAIDX_r13 shape, pair geometry). Probes are timed
(median of 3 after a discarded warmup) under: no ledger (baseline),
1k tombstones, and 1M tombstones (50% of the corpus — takedowns
without a single compaction). Correctness asserted in every cell:
planted twins whose corpus side is tombstoned vanish, the rest stay,
and after compact_media_fp_index (physical purge) the probe output is
byte-identical to the pre-purge tombstoned probe while the raw tables
actually shrank. Exclusive use of the box.

Usage: python tools/scale_stress_tombstones.py > BENCH_TOMBSTONE_r14.json
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_spark_spark.session import get_session  # noqa: E402


def main() -> None:
    from lakehouse_spark_spark.operators.mediaindex import (
        compact_media_fp_index,
        delete_from_media_fp_index,
        load_media_fp_index,
        media_candidates_against_index,
        write_media_fp_index,
    )

    spark = get_session("tombstone_stress")
    spark.sparkContext.setLogLevel("ERROR")

    index_n, batch_n = 2_000_000, 100_000
    twin_bits = (1 << 3) | (1 << 17) | (1 << 29) | (1 << 41) | (1 << 52) | (1 << 60)
    corpus = spark.range(index_n).select(
        F.col("id").alias("doc_id"),
        F.xxhash64(F.col("id"), F.lit(11)).bitwiseAND(F.lit((1 << 62) - 1)).alias("fp"),
    )
    # batch twins of corpus ids 0..batch_n-1 at exactly radius 6
    batch = spark.range(batch_n).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.xxhash64(F.col("id"), F.lit(11))
        .bitwiseAND(F.lit((1 << 62) - 1))
        .bitwiseXOR(F.lit(twin_bits))
        .alias("fp"),
    )
    base = tempfile.mkdtemp(prefix="tombstress_")
    idx_path = os.path.join(base, "idx")
    t0 = time.perf_counter()
    write_media_fp_index(corpus, "doc_id", "fp", idx_path, blocks=8, pair_blocks=True)
    build_sec = round(time.perf_counter() - t0, 3)

    def timed_probe(expect_planted: int) -> float:
        idx = load_media_fp_index(spark, idx_path)

        def run() -> float:
            t = time.perf_counter()
            # count PLANTED pairs exactly (corpus twin = batch id - 10M);
            # a couple of ORGANIC radius-6 collisions are statistically
            # expected at 100k x 2M and must not fail the recall check
            n = (
                media_candidates_against_index(
                    batch, idx, "doc_id", "fp", max_hamming=6
                )
                .filter(F.col("corpus_id") == F.col("new_id") - 10_000_000)
                .count()
            )
            assert n == expect_planted, (n, expect_planted)
            return time.perf_counter() - t
        run()  # warmup, discarded
        import statistics

        return round(statistics.median(run() for _ in range(3)), 3)

    results = {"index": index_n, "batch": batch_n, "build_sec": build_sec}
    results["probe_no_ledger_sec"] = timed_probe(batch_n)

    # 1k takedowns: even corpus ids in [0, 2000) — 1000 planted twins
    # lose their corpus side
    delete_from_media_fp_index(
        spark, idx_path, ids=spark.range(0, 2_000, 2).select(F.col("id").alias("doc_id"))
    )
    results["probe_1k_tombstones_sec"] = timed_probe(batch_n - 1_000)

    # 1M takedowns (every even corpus id; half the planted twins die)
    delete_from_media_fp_index(
        spark, idx_path,
        ids=spark.range(0, index_n, 2).select(F.col("id").alias("doc_id")),
    )
    results["probe_1M_tombstones_sec"] = timed_probe(batch_n // 2)

    # physical purge: probe output identical, raw tables shrink
    fp_dir_rows = spark.read.parquet(os.path.join(idx_path, "fingerprints")).count()
    t0 = time.perf_counter()
    compact_media_fp_index(spark, idx_path)
    results["compact_purge_sec"] = round(time.perf_counter() - t0, 3)
    import json as _json

    with open(os.path.join(idx_path, "manifest.json")) as fh:
        mf = _json.load(fh)
    purged_rows = fp_dir_rows - spark.read.parquet(
        os.path.join(idx_path, mf["fingerprints_dir"])
    ).count()
    assert purged_rows == index_n // 2, purged_rows
    results["purged_fingerprint_rows"] = purged_rows
    results["probe_after_purge_sec"] = timed_probe(batch_n // 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
