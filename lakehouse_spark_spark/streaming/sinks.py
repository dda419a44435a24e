"""Streaming sinks via foreachBatch: the production path from a stream
into lakehouse tables.

Structured Streaming's file sink is append-only; real pipelines land
streams with MERGE semantics (late corrections overwrite by key) or as
versioned gold refreshes. ``foreachBatch`` hands each micro-batch to
batch-side writers, which is exactly where the sources/ layer plugs in:

- ``stream_upsert_sink``: per batch, upsert rows by key into a parquet
  table (sources/sinks.upsert_parquet). Retried batches rewrite the
  SAME keys, so the sink is idempotent under at-least-once delivery —
  the exactly-once EFFECT, which is the contract foreachBatch actually
  offers (the batch id is provided for deduping; key-upsert makes it
  unnecessary).
- ``stream_snapshot_sink``: per batch, publish the current (complete)
  aggregate as a NEW immutable snapshot version
  (sources/snapshots.write_snapshot) — a continuously-refreshed gold
  table where readers keep isolation and any refresh can be rolled
  back by pointer flip.

Scale: each micro-batch write is a normal batch job; the upsert's
read-antijoin-rewrite cost is the plain-parquet tradeoff documented at
sources/sinks.upsert_parquet (a transactional format rewrites only
touched files). State stays in the streaming aggregation upstream —
the sink itself is stateless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_upsert_sink(
    stream_df: DataFrame,
    path: str,
    key_cols: list[str],
    checkpoint_dir: str,
    output_mode: str = "update",
) -> None:
    """Drain the stream (availableNow) into a keyed parquet upsert.
    ``update`` mode emits only changed aggregate rows per batch — the
    natural pairing with a key-upsert (complete mode would rewrite the
    whole table every batch)."""
    from lakehouse_spark_spark.sources.sinks import upsert_parquet

    def _write(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        upsert_parquet(batch.sparkSession, path, batch, key_cols)

    q = (
        stream_df.writeStream.foreachBatch(_write)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_snapshot_sink(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain the stream (availableNow), publishing the full aggregate
    state as a fresh snapshot version per micro-batch. Requires an
    aggregating stream (complete mode). Readers of the snapshot table
    never see a partial refresh; history is bounded with
    snapshots.vacuum."""
    from lakehouse_spark_spark.sources.snapshots import write_snapshot

    def _publish(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        write_snapshot(batch, table_dir)

    q = (
        stream_df.writeStream.foreachBatch(_publish)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
