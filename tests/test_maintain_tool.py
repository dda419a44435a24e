"""tools/maintain.py (r13): one out-of-band pass classifies every
persisted family by its own on-disk metadata and runs its maintenance —
probe outputs must be unchanged, replay contracts intact, and
replay-duplicate rows actually gone."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def base(spark, tmp_path_factory):
    """One live fixture per family under a single base dir, each with a
    fold and some replay-duplicate garbage, plus an exactly-once
    ledger with three committed epochs."""
    import numpy as np

    from lakehouse_spark_spark.operators.annindex import update_ann_index, write_ann_index
    from lakehouse_spark_spark.operators.bloom import update_dedup_index, write_dedup_index
    from lakehouse_spark_spark.operators.contamination import (
        update_decon_index,
        write_decon_index,
    )
    from lakehouse_spark_spark.operators.mediaindex import (
        update_media_fp_index,
        write_media_fp_index,
    )
    from lakehouse_spark_spark.operators.neardup import (
        update_neardup_index,
        write_neardup_index,
    )
    from lakehouse_spark_spark.sources.sinks import append_once_parquet

    root = str(tmp_path_factory.mktemp("maintain_base"))
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select("vec_id", "embedding")
    corpus = docs.filter("doc_id % 3 != 0")
    b1 = docs.filter("doc_id % 6 = 0")

    write_dedup_index(corpus, "text", f"{root}/bloom_idx")
    update_dedup_index(
        f"{root}/bloom_idx",
        b1.select(F.xxhash64("text").cast("string").alias("content_hash")),
        batch_id=1,
    )

    write_neardup_index(corpus, "doc_id", "text", f"{root}/nd_idx")
    update_neardup_index(f"{root}/nd_idx", b1, "doc_id", "text", batch_id=1)

    rng = np.random.RandomState(5)
    fps = spark.createDataFrame(
        [(i, int(rng.randint(0, 2**62))) for i in range(60)], "doc_id bigint, fp bigint"
    )
    write_media_fp_index(fps.filter("doc_id < 40"), "doc_id", "fp", f"{root}/mf_idx")
    update_media_fp_index(f"{root}/mf_idx", fps.filter("doc_id >= 40"), "doc_id", "fp", batch_id=1)

    write_ann_index(
        emb.filter("vec_id % 2 = 0"), "vec_id", "embedding", f"{root}/ann_idx", n_cells=4
    )
    update_ann_index(f"{root}/ann_idx", emb.filter("vec_id % 2 = 1"), "embedding", batch_id=1)

    write_decon_index(docs.filter("doc_id < 50"), "doc_id", "text", f"{root}/decon_idx")
    update_decon_index(
        f"{root}/decon_idx", docs.filter("doc_id >= 50 AND doc_id < 80"), "doc_id", "text", batch_id=1
    )

    for epoch in range(3):
        append_once_parquet(
            spark.range(10).select(
                (F.col("id") + 100 * epoch).alias("doc_id"), F.lit(epoch).alias("v")
            ),
            f"{root}/kept_ledger",
            epoch,
        )

    # replay-duplicate garbage the compactions must clean up
    spark.read.parquet(f"{root}/nd_idx/signatures").limit(10).write.mode("append").parquet(
        f"{root}/nd_idx/signatures"
    )
    spark.read.parquet(f"{root}/mf_idx/fingerprints").limit(5).write.mode("append").parquet(
        f"{root}/mf_idx/fingerprints"
    )
    # a non-family dir that must be skipped untouched
    os.makedirs(f"{root}/random_dir")
    open(f"{root}/random_dir/file.txt", "w").write("not an index")
    return root


def _probes(spark, base):
    """One probe output per family, as sorted row tuples."""
    from lakehouse_spark_spark.operators.annindex import ann_index_topk, load_ann_index
    from lakehouse_spark_spark.operators.bloom import (
        dedup_against_corpus_bloom,
        load_dedup_index,
    )
    from lakehouse_spark_spark.operators.contamination import (
        contamination_hits_against_index,
        load_decon_index,
    )
    from lakehouse_spark_spark.operators.mediaindex import (
        load_media_fp_index,
        media_candidates_against_index,
    )
    from lakehouse_spark_spark.operators.neardup import (
        load_neardup_index,
        neardup_candidates_against_index,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select("vec_id", "embedding")
    probe_docs = docs.filter("doc_id % 6 = 3")
    import numpy as np

    rng = np.random.RandomState(5)
    all_fps = [(i, int(rng.randint(0, 2**62))) for i in range(60)]
    probe_fps = spark.createDataFrame(
        [(1000, all_fps[3][1]), (1001, all_fps[50][1] ^ 3)], "doc_id bigint, fp bigint"
    )
    out = {}
    out["bloom"] = sorted(
        (r["doc_id"], r["keep"])
        for r in dedup_against_corpus_bloom(
            probe_docs, None, "doc_id", "text", index=load_dedup_index(spark, f"{base}/bloom_idx")
        ).collect()
    )
    out["neardup"] = sorted(
        tuple(r)
        for r in neardup_candidates_against_index(
            probe_docs, load_neardup_index(spark, f"{base}/nd_idx"), "doc_id", "text"
        ).collect()
    )
    out["mediaindex"] = sorted(
        tuple(r)
        for r in media_candidates_against_index(
            probe_fps, load_media_fp_index(spark, f"{base}/mf_idx"), "doc_id", "fp", max_hamming=4
        ).collect()
    )
    out["ann"] = sorted(
        tuple(r)
        for r in ann_index_topk(
            load_ann_index(spark, f"{base}/ann_idx"), emb.filter("vec_id < 3"),
            "embedding", k=3, n_probe=2, shortlist=16,
        ).collect()
    )
    out["decon"] = sorted(
        tuple(r)
        for r in contamination_hits_against_index(
            probe_docs, load_decon_index(spark, f"{base}/decon_idx"), "doc_id", "text"
        ).collect()
    )
    out["ledger"] = sorted(
        tuple(r) for r in spark.read.parquet(f"{base}/kept_ledger").select("doc_id", "v").collect()
    )
    return out


def test_maintain_pass_preserves_probes_and_contracts(spark, base):
    from tools.maintain import classify, maintain

    # classification: every family recognized, the stray dir skipped
    got = {os.path.basename(p): classify(os.path.join(base, p)) for p in os.listdir(base)}
    assert got == {
        "bloom_idx": "bloom", "nd_idx": "neardup", "mf_idx": "mediaindex",
        "ann_idx": "ann", "decon_idx": "decon", "kept_ledger": "ledger",
        "random_dir": None,
    }

    before = _probes(spark, base)
    actions = maintain(spark, base, target_mb=256)
    assert {a["family"] for a in actions} == {
        "bloom", "neardup", "mediaindex", "ann", "decon", "ledger"
    }
    assert _probes(spark, base) == before

    # replay-duplicate rows actually gone
    from lakehouse_spark_spark.operators.mediaindex import load_media_fp_index
    from lakehouse_spark_spark.operators.neardup import load_neardup_index

    nd = load_neardup_index(spark, f"{base}/nd_idx")
    assert nd.signatures.count() == nd.signatures.dropDuplicates(["__id"]).count()
    mf = load_media_fp_index(spark, f"{base}/mf_idx")
    assert mf.fingerprints.count() == mf.fingerprints.dropDuplicates(["__id"]).count()

    # ledger replay contract: committed epochs still skip after the
    # partition-preserving compaction (floor manifest + dirs intact)
    from lakehouse_spark_spark.sources.sinks import append_once_parquet

    wrote = append_once_parquet(
        spark.range(5).select(F.col("id").alias("doc_id"), F.lit(99).alias("v")),
        f"{base}/kept_ledger",
        1,
    )
    assert wrote is False
    assert sorted(
        tuple(r) for r in spark.read.parquet(f"{base}/kept_ledger").select("doc_id", "v").collect()
    ) == before["ledger"]

    # fold watermarks intact: a replayed fold is still a no-op
    from lakehouse_spark_spark.operators.mediaindex import update_media_fp_index

    n_before = mf.fingerprints.count()
    update_media_fp_index(
        f"{base}/mf_idx",
        spark.range(3).select(F.col("id").alias("doc_id"), F.lit(7).alias("fp")),
        "doc_id", "fp", batch_id=1,
    )
    assert load_media_fp_index(spark, f"{base}/mf_idx").fingerprints.count() == n_before

    # idempotence of the whole pass: a second run still preserves probes
    maintain(spark, base, target_mb=256)
    assert _probes(spark, base) == before


def test_maintain_dry_run_touches_nothing(spark, base):
    from tools.maintain import maintain

    before = _probes(spark, base)
    actions = maintain(spark, base, dry_run=True)
    assert len(actions) == 6 and all(set(a) == {"path", "family"} for a in actions)
    assert _probes(spark, base) == before
