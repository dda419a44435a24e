"""Composed training-corpus pipeline: backend equivalence and semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_minhash_backend_equals_exact_backend(spark):
    """LSH-candidates + exact verification must produce the SAME final
    dispositions as full exact Jaccard at threshold 0.8 (LSH recall at
    j>=0.8 with 16x4 banding is ~0.9997; on this corpus it is exact)."""
    from lakehouse_spark_spark.plans.corpus import prepare_corpus
    from lakehouse_spark_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    exact = {(r["doc_id"], r["verdict"]) for r in prepare_corpus(docs, 0.8, "exact").collect()}
    mh = {(r["doc_id"], r["verdict"]) for r in prepare_corpus(docs, 0.8, "minhash").collect()}
    assert exact == mh


def test_disposition_covers_every_doc_exactly_once(spark):
    from lakehouse_spark_spark.plans.corpus import prepare_corpus
    from lakehouse_spark_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    disp = prepare_corpus(docs)
    assert disp.count() == docs.count()
    assert disp.select("doc_id").distinct().count() == docs.count()
    verdicts = {r["verdict"] for r in disp.select("verdict").distinct().collect()}
    assert verdicts <= {"kept", "too_short", "too_long", "lang_filtered", "low_quality", "exact_dup", "near_dup"}
    assert "kept" in verdicts


def test_synthetic_dups_are_dropped(spark):
    """Planted duplicates: an exact copy and a near-copy of a kept doc
    must come back as exact_dup / near_dup, originals stay kept."""
    from lakehouse_spark_spark.plans.corpus import prepare_corpus

    base = " ".join(f"tok{i % 40}" for i in range(80)) + " the a of and is"
    near = base.replace("tok1 ", "changed ", 1)
    rows = [
        (1, "en", base),
        (2, "en", base),          # exact dup of 1
        (3, "en", near),          # near dup of 1 (jaccard >= 0.8)
        (4, "en", " ".join(f"zz{i % 37}" for i in range(80)) + " the a"),  # independent
        (5, "en", "short text"),  # too_short
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = {r["doc_id"]: r["verdict"] for r in prepare_corpus(docs, 0.8).collect()}
    assert got[1] == "kept"
    assert got[2] == "exact_dup"
    assert got[3] == "near_dup"
    assert got[4] == "kept"
    assert got[5] == "too_short"


def test_cluster_policy_drops_superset_of_pairwise(spark):
    """If v is pairwise-dropped (some neighbour u < v) then
    component(v) <= u < v, so the cluster policy drops it too:
    cluster-dropped must be a superset of pairwise-dropped. On data
    where the pair graph has no chains the two policies coincide."""
    from lakehouse_spark_spark.plans.corpus import prepare_corpus
    from lakehouse_spark_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    pw = {r["doc_id"] for r in prepare_corpus(docs, 0.8).filter("verdict = 'near_dup'").collect()}
    cc = {
        r["doc_id"]
        for r in prepare_corpus(docs, 0.8, drop_policy="cluster").filter("verdict = 'near_dup'").collect()
    }
    assert pw <= cc


def test_cluster_policy_keeps_one_per_transitive_group(spark):
    """Planted chain a~b, b~c with a!~c: pairwise drops b and c;
    cluster also drops b and c (one representative for {a,b,c}).
    Planted fork 1~3, 2~3 with 1!~2: pairwise keeps {1,2}, cluster
    keeps only 1 — the transitive semantics."""
    from lakehouse_spark_spark.plans.corpus import prepare_corpus

    filler = " the a of and is"
    # fork: doc 3 is half doc-1 tokens, half doc-2 tokens; 1 and 2 share nothing
    one = " ".join(f"aa{i}" for i in range(60)) + filler
    two = " ".join(f"bb{i}" for i in range(60)) + filler
    # 3 = one with a tail of two's tokens, tuned so J(1,3)>=t, J(2,3)<t at t=0.3... use t low
    three = " ".join(f"aa{i}" for i in range(40)) + " " + " ".join(f"bb{i}" for i in range(40)) + filler
    docs = spark.createDataFrame([(1, "en", one), (2, "en", two), (3, "en", three)], ["doc_id", "lang", "text"])
    pw = {r["doc_id"]: r["verdict"] for r in prepare_corpus(docs, 0.3).collect()}
    cc = {r["doc_id"]: r["verdict"] for r in prepare_corpus(docs, 0.3, drop_policy="cluster").collect()}
    # pair graph: (1,3) and (2,3) — 3 dropped under both policies
    assert pw[3] == "near_dup" and cc[3] == "near_dup"
    assert pw[1] == "kept" and cc[1] == "kept"
    # 2 survives pairwise (never the greater of an edge with a smaller id
    # ... it is: edge (2,3) has smaller id 2, so 2 is the keeper there);
    # cluster merges {1,2,3} via 3 and keeps only the min, dropping 2.
    assert pw[2] == "kept"
    assert cc[2] == "near_dup"


class TestCurationV3:
    def test_conservation_and_minhash_backend(self, spark):
        """curation_v3: every input doc lands in exactly one disposition
        (Σ n_docs = |corpus|, Σ tokens_in = corpus tokens), shipped
        accounting is consistent, and the minhash near-dup backend
        yields the IDENTICAL summary (LSH recall holds at 0.8)."""
        from lakehouse_spark_spark.operators.text import n_tokens
        from lakehouse_spark_spark.plans.corpus import curation_v3
        from lakehouse_spark_spark.sources.loaders import load_table

        docs = load_table(spark, SF_SMALL, "documents")
        out = curation_v3(docs).collect()
        n_corpus = docs.count()
        tok_corpus = docs.select(F.sum(n_tokens("text").cast("long")).alias("t")).collect()[0]["t"]
        assert sum(r["n_docs"] for r in out) == n_corpus
        assert sum(r["tokens_in"] for r in out) == tok_corpus
        for r in out:
            if r["disposition"].startswith("kept_"):
                assert 0 < r["tokens_out"] <= r["tokens_in"]
                assert r["n_sequences"] >= r["n_docs"]  # every doc ≥1 seq
            else:
                assert r["tokens_out"] == 0 and r["n_sequences"] == 0
        mh = curation_v3(docs, neardup_backend="minhash").collect()
        key = lambda rows: sorted(map(tuple, rows))
        assert key(mh) == key(out)


class TestCurationV3Properties:
    def test_conservation_on_adversarial_corpora(self, spark):
        """Conservation must hold for ANY input shape: duplicates,
        empty-ish docs, unknown langs, blocklist hits, eval-slice ids —
        every doc lands in exactly one disposition and token totals
        reconcile."""
        from lakehouse_spark_spark.operators.text import n_tokens
        from lakehouse_spark_spark.plans.corpus import curation_v3

        rows = [
            (0, "en", "s1", "the quick brown fox " * 10),          # passes gates
            (1, "en", "s1", "the quick brown fox " * 10),          # exact dup of 0
            (2, "zh", "s1", "the word " * 15),                      # lang filtered
            (3, "en", "s2", "gibberish " + "the word " * 15),       # blocked
            (4, "en", "s2", "x"),                                   # too short
            (97, "en", "s2", "the eval holdout doc words " * 8),    # eval slice id
            (5, "en", "s3", "the eval holdout doc words " * 8),     # contaminated vs 97
            (6, "en", "s3", "table " * 40),                         # bullet-line heavy
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")
        out = curation_v3(df).collect()
        assert sum(r["n_docs"] for r in out) == len(rows)
        tok = df.select(F.sum(n_tokens("text").cast("long")).alias("t")).collect()[0]["t"]
        assert sum(r["tokens_in"] for r in out) == tok
        by = {r["disposition"]: r["n_docs"] for r in out}
        assert by.get("exact_dup", 0) >= 1
        assert by.get("lang_filtered", 0) >= 1
        assert by.get("blocked", 0) >= 1
        assert by.get("eval_holdout", 0) == 1
        assert by.get("contaminated", 0) >= 1

    def test_all_docs_fail_gates(self, spark):
        """Degenerate corpus where nothing survives the gates: the
        downstream stages (dedup, clusters, spans, budget) see empty
        inputs and the chain must not crash or lose docs."""
        from lakehouse_spark_spark.plans.corpus import curation_v3

        rows = [(i, "zh", "s", "the word " * 15) for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")
        out = curation_v3(df).collect()
        assert sum(r["n_docs"] for r in out) == 6
        assert {r["disposition"] for r in out} == {"lang_filtered"}


class TestCurationV3PinModes:
    def test_parquet_pin_equals_local_pin(self, spark, tmp_path):
        """The reliable-checkpoint seam (round-6 verdict ask #6): pinning
        the three reused stage frames via a parquet round-trip (the
        1000-executor setting — survives executor loss, downstream plan
        restarts from a clean columnar scan) must produce the
        hash-identical disposition summary as the default
        localCheckpoint mode."""
        from lakehouse_spark_spark.plans.corpus import curation_v3
        from lakehouse_spark_spark.sources.loaders import load_table

        docs = load_table(spark, SF_SMALL, "documents")
        key = lambda rows: sorted(map(tuple, rows))
        local = curation_v3(docs).collect()
        parquet = curation_v3(docs, pin="parquet", pin_dir=str(tmp_path / "pins")).collect()
        assert key(parquet) == key(local)
        # the v4 learned stage adds two more pinned frames (clf_scored,
        # lf_dropped) — the seam must hold for them too
        local4 = curation_v3(docs, learned_filter=True).collect()
        parquet4 = curation_v3(
            docs, learned_filter=True, pin="parquet", pin_dir=str(tmp_path / "pins4")
        ).collect()
        assert key(parquet4) == key(local4)

    def test_unknown_pin_mode_raises(self, spark):
        import pytest

        from lakehouse_spark_spark.plans.corpus import curation_v3
        from lakehouse_spark_spark.sources.loaders import load_table

        docs = load_table(spark, SF_SMALL, "documents")
        with pytest.raises(ValueError, match="pin"):
            curation_v3(docs, pin="hdfs")

    def test_parquet_pin_without_dir_raises(self, spark):
        """No silent driver-local tempdir (r7 ADVICE): parquet pinning
        is the cluster mode, so it must demand a cluster-visible URI
        instead of defaulting to a mkdtemp path executors can't see."""
        import pytest

        from lakehouse_spark_spark.plans.corpus import curation_v3
        from lakehouse_spark_spark.sources.loaders import load_table

        docs = load_table(spark, SF_SMALL, "documents")
        with pytest.raises(ValueError, match="pin_dir"):
            curation_v3(docs, pin="parquet")


class TestCurationV4LearnedFilter:
    def test_drop_frac_zero_is_report_identical_to_v3(self, spark):
        """The v4 seam: clf_drop_frac=0.0 calibrates the cutoff to
        min(score) and the strict < drops nothing, so the learned
        stage is a no-op and the report equals the flag-off chain."""
        from lakehouse_spark_spark.plans.corpus import curation_v3
        from lakehouse_spark_spark.sources.loaders import load_table

        docs = load_table(spark, SF_SMALL, "documents")
        key = lambda rows: sorted(map(tuple, rows))
        v3 = curation_v3(docs).collect()
        v4_off = curation_v3(docs, learned_filter=True, clf_drop_frac=0.0).collect()
        assert key(v4_off) == key(v3)

    def test_learned_filter_drops_bottom_fraction_and_conserves(self, spark):
        """Default v4: conservation still holds doc- and token-exact,
        the learned_filter disposition is populated (the quantile
        cutoff guarantees it whenever survivors exist), its docs came
        OUT of the v3 survivor pool (downstream dispositions can only
        shrink), and dropped docs ship nothing."""
        from lakehouse_spark_spark.operators.text import n_tokens
        from lakehouse_spark_spark.plans.corpus import curation_v3
        from lakehouse_spark_spark.sources.loaders import load_table

        docs = load_table(spark, SF_SMALL, "documents")
        out = {r["disposition"]: r for r in
               curation_v3(docs, learned_filter=True, clf_drop_frac=0.3).collect()}
        n_corpus = docs.count()
        tok_corpus = docs.select(
            F.sum(n_tokens("text").cast("long")).alias("t")
        ).collect()[0]["t"]
        assert sum(r["n_docs"] for r in out.values()) == n_corpus
        assert sum(r["tokens_in"] for r in out.values()) == tok_corpus
        lf = out["learned_filter"]
        assert lf["n_docs"] > 0
        assert lf["tokens_out"] == 0 and lf["n_sequences"] == 0
        # upstream dispositions are untouched by the new stage; the
        # learned drops come out of the post-dedup survivor pool
        v3 = {r["disposition"]: r for r in curation_v3(docs).collect()}
        for d in ("quality_word", "quality_line", "lang_filtered", "blocked",
                  "exact_dup", "near_dup", "eval_holdout"):
            if d in v3 or d in out:
                assert out.get(d) and v3.get(d) and out[d]["n_docs"] == v3[d]["n_docs"], d
        downstream_v3 = sum(r["n_docs"] for d, r in v3.items()
                            if d.startswith("kept_") or d in ("contaminated", "budget_excess"))
        downstream_v4 = sum(r["n_docs"] for d, r in out.items()
                            if d.startswith("kept_") or d in ("contaminated", "budget_excess"))
        assert downstream_v4 == downstream_v3 - lf["n_docs"]
