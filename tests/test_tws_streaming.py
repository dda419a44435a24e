"""Spark 4 transformWithState (TWS) running totals vs the batch twin.

TWS requires the RocksDB state store; the test pins the provider for
the query and restores the session conf afterwards. Totals are exact
integers (cents), so streaming == batch equality is bitwise regardless
of how the availableNow drain splits micro-batches.

SKIPPED where `google.protobuf` is absent: PySpark's TWS state client
is protobuf-based (proto/StateMessage_pb2.py) and the TWS driver
worker crashes without it — the sandbox constraint documented in
streaming/stateful.py and SCALE.md.
"""

from __future__ import annotations

import importlib.util
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

pytestmark = pytest.mark.skipif(
    importlib.util.find_spec("google") is None
    or importlib.util.find_spec("google.protobuf") is None,
    reason="TWS python state client needs protobuf (absent in this sandbox)",
)

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def test_tws_running_totals_match_batch(spark):
    from lakehouse_spark_spark.sources.loaders import load_table
    from lakehouse_spark_spark.streaming.events import read_event_stream
    from lakehouse_spark_spark.streaming.stateful import tws_running_totals

    prev = spark.conf.get(PROVIDER_CONF, None)
    ck = tempfile.mkdtemp(prefix="tws_ck_")
    try:
        spark.conf.set(PROVIDER_CONF, ROCKSDB)
        stream = read_event_stream(spark, SF_SMALL, glob="events.parquet")
        q = (
            tws_running_totals(stream)
            .writeStream.format("memory")
            .queryName("tws_totals")
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got_df = spark.table("tws_totals")
        # Update mode re-emits per touched key per batch: the running
        # totals are monotone, so the final state is the max per key.
        got = {
            r["user_id"]: (r["n_events"], r["sum_cents"])
            for r in got_df.groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"), F.max("sum_cents").alias("sum_cents"))
            .collect()
        }
        batch = (
            load_table(spark, SF_SMALL, "events")
            .select("user_id", F.round(F.col("value") * 100).cast("long").alias("cents"))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
        )
        want = {r["user_id"]: (r["n"], r["s"]) for r in batch.collect()}
        assert got == want
        assert len(want) > 10
    finally:
        if prev is None:
            spark.conf.unset(PROVIDER_CONF)
        else:
            spark.conf.set(PROVIDER_CONF, prev)
        shutil.rmtree(ck, ignore_errors=True)
