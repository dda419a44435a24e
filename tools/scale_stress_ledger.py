"""Epoch-count scaling stress: exactly-once ledger metadata growth and
the compaction that bounds it.

The r12 claim under test: a long-running stream's
``append_once_parquet`` ledger accumulates one ``batch_id=`` partition
dir per epoch (each holding KB-scale files), and the SCAN cost of that
ledger — which every redrain/audit pays — grows with the dir count
(driver-side file listing + one task per tiny file), while
``compact_ledger_parquet`` rewrites it to size-targeted files WITHOUT
breaking the replay contract (the per-epoch dirs survive; the floor
manifest covers any future merge).

Method: fold N single-row epochs (N = 250 / 1000) through the real
``append_once_parquet`` path, then measure (a) data-file count, (b)
cold-session ledger scan+count wall time (a fresh SparkSession per
measurement so file listing is not cached), before and after
compaction; assert the row set survives compaction and a redrain of an
old epoch is still skipped. Exclusive use of the box.

Usage: python tools/scale_stress_ledger.py > out.json
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _file_count(base: str) -> int:
    return sum(
        1 for dp, _, fs in os.walk(base) for f in fs if f.startswith("part-") and f.endswith(".parquet")
    )


def _cold_scan_sec(path: str, app: str) -> tuple[float, int]:
    """Scan+count in a FRESH session so driver-side file listing is paid
    (the cost a redrain/audit of a long-lived ledger actually sees)."""
    from lakehouse_spark_spark.session import get_session

    spark = get_session(app)
    spark.sparkContext.setLogLevel("ERROR")
    # drop any cached listing from a previous measurement of this path
    spark.catalog.clearCache()
    t0 = time.monotonic()
    n = spark.read.parquet(path).count()
    return round(time.monotonic() - t0, 3), n


def main() -> None:
    from pyspark.sql import functions as F

    from lakehouse_spark_spark.session import get_session
    from lakehouse_spark_spark.sources.sinks import append_once_parquet, compact_ledger_parquet

    spark = get_session("ledger-stress")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for n_epochs in (250, 1000):
        with tempfile.TemporaryDirectory(prefix="ledger_stress_") as tmp:
            led = os.path.join(tmp, "keeps")
            row = spark.range(1).select(
                F.col("id").alias("doc_id"), F.lit(0.0).alias("max_corpus_cos")
            ).localCheckpoint(eager=True)
            t0 = time.monotonic()
            for e in range(n_epochs):
                append_once_parquet(row.select((F.col("doc_id") + e).alias("doc_id"), "max_corpus_cos"), led, e)
            fold_sec = round(time.monotonic() - t0, 1)
            files_before = _file_count(led)
            scan_before, rows_before = _cold_scan_sec(led, f"ledger-scan-pre-{n_epochs}")
            files_after = compact_ledger_parquet(spark, led, target_file_mb=256)
            scan_after, rows_after = _cold_scan_sec(led, f"ledger-scan-post-{n_epochs}")
            assert rows_before == rows_after == n_epochs, (rows_before, rows_after)
            # replay contract survives: an old epoch redrain is a no-op
            wrote = append_once_parquet(
                row.select(F.lit(10_000_000).alias("doc_id"), "max_corpus_cos"), led, 0
            )
            assert wrote is False
            _, rows_final = _cold_scan_sec(led, f"ledger-scan-final-{n_epochs}")
            assert rows_final == n_epochs
            results.append(
                {
                    "epochs": n_epochs,
                    "fold_sec_total": fold_sec,
                    "files_before": files_before,
                    "files_after": files_after,
                    "cold_scan_sec_before": scan_before,
                    "cold_scan_sec_after": scan_after,
                }
            )
            print(json.dumps(results[-1]), file=sys.stderr, flush=True)
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
