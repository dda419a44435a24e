"""Distributed Bloom filter + bloom-prefiltered incremental dedup.

The production shape for periodic-ingest exact dedup at 100 TB (the
Dolma/CCNet dedup-index pattern): the accumulated corpus's hash set is
summarized into a Bloom filter whose size is a TUNING constant (m bits),
independent of corpus row width; each new batch is membership-tested
against the filter, and only the bloom-POSITIVE candidates — true dups
plus an FP-rate-bounded sliver of the batch — ever touch the real
corpus index. Bloom filters have no false negatives, so a negative is a
definitive "novel document" with zero joins against the corpus; false
positives are eliminated by an exact verify join over the (small)
candidate set, which keeps the operator's OUTPUT byte-identical to
plain exact dedup — the filter changes the plan, never the answer.

Everything is declarative DataFrame code on the JVM side — no RDDs, no
driver-side bitmaps, no Python UDFs:

- BUILD: explode each corpus hash into its k probe positions (slim
  (word, mask) longs), then ``groupBy(word).agg(bit_or(mask))``.
  bit_or partially aggregates map-side, so the build shuffle carries at
  most ``partitions x m/64`` rows REGARDLESS of corpus size — the
  filter itself is a DataFrame of <= m/64 rows (1 M bits = 16 K rows),
  a broadcastable dim table.
- TEST: explode the batch's probe positions, broadcast-join the filter
  on the word index, AND the masks, and require all k probes to hit
  (min over the probe flags — map-side combinable). One slim shuffle
  on the batch id, nothing on the corpus.

Spark's own runtime bloom-join injection (InjectRuntimeFilter) does
this transparently for some join shapes, but only within one query and
never persistably; this operator makes the filter a first-class frame
you can write out and reuse across ingest runs (the real win: the next
batch never re-reads the corpus at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from lakehouse_spark_spark.operators.dedup import content_hash

# Probe j's position for value c: an independent 60-bit hash per probe
# from md5(c || US || j) (the first 15 hex digits — sign-safe in a
# bigint), reduced mod m. Deterministic across sessions and engines.
_SEP = "\x1f"


def _probe_positions(c: Column, k: int, m_bits: int) -> Column:
    """Array of ``k`` bit positions in [0, m_bits) for value ``c``."""
    return F.array(
        *[
            F.pmod(
                F.conv(F.substring(F.md5(F.concat(c, F.lit(f"{_SEP}{j}"))), 1, 15), 16, 10).cast(
                    "bigint"
                ),
                F.lit(m_bits),
            )
            for j in range(k)
        ]
    )


def _bit_mask() -> Column:
    """1 << (__pos % 64) as a bigint — SQL-expression form because the
    Python-API ``shiftleft`` only takes a literal shift amount."""
    return F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos, 64) AS INT))")


def bloom_build(values: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 7) -> DataFrame:
    """Build a Bloom filter over ``values[col]`` as a DataFrame of
    ``(word bigint, bits bigint)`` — word ``w`` holds bit positions
    ``[64w, 64w+64)``. Only words with >= 1 set bit are materialized,
    so the frame is <= m_bits/64 rows and usually far smaller.

    Scale shape: the explode emits k slim rows per value; ``bit_or``
    partial-aggregates map-side, capping the shuffle at
    partitions x m/64 rows no matter how many values stream through.
    """
    pos = values.select(F.explode(_probe_positions(F.col(col), k, m_bits)).alias("__pos"))
    return (
        pos.select(
            (F.col("__pos") / 64).cast("bigint").alias("word"),
            _bit_mask().alias("__mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_might_contain(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    id_col: str | None = None,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> DataFrame:
    """Stamp ``df`` with ``__bloom_hit``: true iff ALL k probe bits for
    ``df[col]`` are set in ``bloom`` (no false negatives; false
    positives at the filter's designed rate).

    Membership is a property of the VALUE, so the test runs over the
    DISTINCT values of ``col`` and left-joins the flags back: duplicate
    values probe once, EVERY input row survives (a NULL value — which
    has no hash — comes back ``__bloom_hit = false``, matching the
    exact operator's null-never-equal join semantics; an inner join on
    a row id would silently drop such rows). ``bloom`` is broadcast
    (<= m/64 rows by construction); the per-probe flags reduce with a
    map-side-combinable ``min`` keyed by the value — the only shuffle
    is slim (value, bool) rows, bounded by |distinct values|.

    ``id_col`` is accepted for call-site compatibility and unused.
    """
    vals = df.select(col).filter(F.col(col).isNotNull()).distinct()
    probes = vals.select(
        F.col(col), F.posexplode(_probe_positions(F.col(col), k, m_bits)).alias("__j", "__pos")
    ).select(
        col,
        (F.col("__pos") / 64).cast("bigint").alias("word"),
        _bit_mask().alias("__mask"),
    )
    hit_j = (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(
            col,
            (F.col("bits").isNotNull() & (F.col("bits").bitwiseAND(F.col("__mask")) != 0)).alias(
                "__h"
            ),
        )
        .groupBy(col)
        .agg(F.min("__h").alias("__bloom_hit"))
    )
    return df.join(hit_j, col, "left").withColumn(
        "__bloom_hit", F.coalesce("__bloom_hit", F.lit(False))
    )


def dedup_against_corpus_bloom(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> DataFrame:
    """Bloom-prefiltered incremental exact dedup — same output contract
    as ``dedup.dedup_against_corpus`` (one row per batch doc:
    ``(id, content_hash, dup_of_corpus, dup_in_batch, keep)``), but the
    corpus index is only consulted for bloom-positive candidates.

    Plan: build (or in production: load) the corpus-hash Bloom filter;
    membership-test the batch; broadcast the candidate hash set INTO the
    corpus index scan as a semi-join (the manual version of a runtime
    filter — the index is scanned but never shuffled); left-join the
    verified hits back. Bloom negatives skip the index entirely, and
    false positives die at the verify join, so the result is
    byte-identical to the exact operator for every (m_bits, k).

    Candidate-set bound (the broadcast contract): |batch ∩ corpus| plus
    ~fp_rate x |batch| — for a dedup-ingest workload both are tiny
    relative to the corpus; size m_bits for the corpus cardinality
    (~10 bits/element for ~1% FP at k=7).
    """
    bh = batch.select(F.col(id_col), content_hash(text_col).alias("content_hash"))
    corpus_hashes = corpus.select(content_hash(text_col).alias("content_hash")).distinct()
    bloom = bloom_build(corpus_hashes, "content_hash", m_bits, k)
    flagged = bloom_might_contain(bh, "content_hash", bloom, id_col, m_bits, k)
    cand = flagged.filter(F.col("__bloom_hit")).select("content_hash").distinct()
    verified = (
        corpus_hashes.join(F.broadcast(cand), "content_hash", "semi")
        .withColumn("__in_corpus", F.lit(True))
    )
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    return (
        flagged.join(F.broadcast(verified), "content_hash", "left")
        .withColumn("dup_of_corpus", F.coalesce("__in_corpus", F.lit(False)))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("dup_in_batch", F.col("__rn") > 1)
        .withColumn("keep", ~F.col("dup_of_corpus") & ~F.col("dup_in_batch"))
        .select(id_col, "content_hash", "dup_of_corpus", "dup_in_batch", "keep")
    )
