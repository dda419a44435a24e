"""Distributed global rank / prefix-sum — the scale-safe replacement for
``Window.orderBy(...)`` with no partition spec.

An unpartitioned window funnels the whole input through ONE WindowExec
task (Spark logs ``WindowExec: No Partition Defined``); at 100 TB that
is a single-task sort of the corpus. The classic fix (used by every
distributed rank implementation, e.g. Spark's own ``zipWithIndex``) is
a two-pass plan:

1. ``repartitionByRange`` on the order key — each partition owns a
   contiguous key range, so global order = (partition index, local
   order). Rows with EQUAL keys land in the same partition (the range
   partitioner assigns by boundary), so per-partition windows see all
   peers.
2. A per-partition window (``partitionBy(spark_partition_id())``) gives
   local row numbers / running sums in parallel.
3. Per-partition row counts (one tiny aggregate, ≤ numPartitions rows)
   are collected to the driver, cumulated into per-partition OFFSETS,
   and broadcast-joined back. ``global = local + offset``.

Driver-side state is O(numPartitions) — a few KB at any data scale.

Consistency note: the offsets job and the final job must see the SAME
``__pid`` assignment. Recomputing the range exchange per job is NOT
safe under AQE — adaptive execution re-plans the upstream shuffle
per query (partition coalescing depends on downstream stats), which
changes the range-sampler's per-partition seeds and therefore the
boundaries (observed: sf0.1 ranks drifted by up to ~70 between the two
jobs). So :func:`range_partitioned` pins the partitioning with
``localCheckpoint`` — the rank input is materialized once (cluster
memory/disk) and both passes read the frozen partitions. The input at
this point is already reduced (distinct values / one slim row per doc),
so the checkpoint is far smaller than the corpus — e.g. ~30 B/doc for
a per-document score at 100 TB, a normal dedup-scale cache.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _num_parts(df: DataFrame, num_partitions: int | None) -> int:
    if num_partitions:
        return int(num_partitions)
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


def range_partitioned(
    df: DataFrame, order_cols: list[Column], num_partitions: int | None = None
) -> DataFrame:
    """Range-repartition on ``order_cols`` and stamp the physical
    partition index as ``__pid`` (== range-bucket index, ascending in
    the sort order). localCheckpointed so every downstream job sees the
    identical ``__pid`` assignment — see the module docstring for why
    recompute-per-job is unsafe under AQE. (Note: PySpark 4.1 runs the
    checkpoint job AT CALL TIME even with eager=False — measured in
    SCALE.md 'timing-basis fix' — so callers should treat construction
    as doing the materialization work.)"""
    n = _num_parts(df, num_partitions)
    parts = df.repartitionByRange(n, *order_cols).withColumn("__pid", F.spark_partition_id())
    return parts.localCheckpoint(eager=False)


def with_global_prefix(
    df: DataFrame,
    order_cols: list[Column],
    sum_cols: tuple[str, ...] = (),
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Add ``__rn`` (1-based global row number under ``order_cols``)
    and, per name ``s`` in ``sum_cols``, ``__cum_<s>`` (global inclusive
    running sum of column ``s`` in the same order).

    Returns ``(df, totals)`` with ``totals["__rows"]`` = total row count
    and ``totals[s]`` = grand total of each sum column — free
    by-products of the offsets pass, so callers don't pay extra jobs
    for n.

    ``order_cols`` must be a total order (no ties) for ``__rn`` to be
    deterministic; running sums additionally use an explicit ROWS frame
    so ties would not double-count peers.
    """
    parts = range_partitioned(df, order_cols, num_partitions)
    # Offset columns carry the same type Spark's SUM would produce for
    # each input column (analysis-only probe, no job) — so decimal and
    # double sum columns keep their type through the broadcast join
    # instead of being truncated to BIGINT.
    sum_types = {
        s: parts.select(F.sum(F.col(s)).alias("x")).schema["x"].dataType.simpleString()
        for s in sum_cols
    }
    aggs = [F.count(F.lit(1)).alias("__c")] + [
        F.sum(F.col(s)).alias(f"__s_{s}") for s in sum_cols
    ]
    pid_rows = sorted(parts.groupBy("__pid").agg(*aggs).collect(), key=lambda r: r["__pid"])

    import decimal

    def _coerce(s: str, v):
        t = sum_types[s]
        if t.startswith("decimal"):
            return decimal.Decimal(v)
        if t in ("double", "float"):
            return float(v)
        return int(v)

    offsets: list[tuple] = []
    run_rows = 0
    run_sums = {s: 0 for s in sum_cols}
    for r in pid_rows:
        offsets.append(
            (int(r["__pid"]), run_rows, *[_coerce(s, run_sums[s]) for s in sum_cols])
        )
        run_rows += int(r["__c"])
        for s in sum_cols:
            run_sums[s] += r[f"__s_{s}"] or 0
    totals = {"__rows": run_rows, **run_sums}

    spark = df.sparkSession
    schema = ", ".join(
        ["__pid INT", "__off BIGINT"]
        + [f"__offsum_{s} {sum_types[s]}" for s in sum_cols]
    )
    off_df = spark.createDataFrame(offsets or [], schema)

    w = Window.partitionBy("__pid").orderBy(*order_cols)
    w_rows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = parts.withColumn("__rn_local", F.row_number().over(w))
    for s in sum_cols:
        out = out.withColumn(f"__cumloc_{s}", F.sum(F.col(s)).over(w_rows))
    out = out.join(F.broadcast(off_df), "__pid")
    out = out.withColumn("__rn", (F.col("__rn_local") + F.col("__off")).cast("long"))
    for s in sum_cols:
        out = out.withColumn(f"__cum_{s}", F.col(f"__cumloc_{s}") + F.col(f"__offsum_{s}"))
    drop = (
        ["__pid", "__rn_local", "__off"]
        + [f"__cumloc_{s}" for s in sum_cols]
        + [f"__offsum_{s}" for s in sum_cols]
    )
    return out.drop(*drop), totals


def global_ntile(rn: Column, n_rows: int, k: int) -> Column:
    """NTILE(k) from a precomputed global row number — the broadcast-
    threshold form of the bucket assignment (no window needed).

    Matches SQL NTILE exactly: with ``q, r = divmod(n, k)`` the first
    ``r`` buckets get ``q+1`` rows, the rest ``q``.
    The bucket boundaries are computed driver-side as exact Python ints
    (k is small) and emitted as a when-chain — no division on the
    executor at all, so no float rounding at any row count.
    """
    q, r = divmod(int(n_rows), int(k))
    expr = None
    hi = 0
    for i in range(1, int(k)):
        hi += q + 1 if i <= r else q
        cond = rn <= F.lit(hi)
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    if expr is None:  # k == 1
        return F.lit(1).cast("int")
    return expr.otherwise(int(k)).cast("int")
