"""Multi-dimensional data layout: Z-order clustering for file skipping.

Partitioning prunes on ONE column hierarchy and bucketing co-locates
ONE join key. When queries filter on SEVERAL columns (e.g. part AND
supplier), the lakehouse answer is Z-ORDER: map each row to a point on
a space-filling curve over the filter columns, then range-partition and
sort by the curve value. Rows close in the curve are close in EVERY
dimension, so each parquet file covers a narrow min/max range of EVERY
filter column — and min/max footer stats (or a format's file-level
stats: Delta data skipping, Iceberg metrics) let scans skip most files
for a predicate on ANY of the dimensions, not just the leading sort
key. A plain lexicographic sort gives skipping only on the first
column; Z-order spreads it across all of them (at a mild cost to the
first column's own selectivity).

Implementation is pure DataFrame ops + one bounded driver action:

1. per column: approxQuantile computes 2^bits bucket boundaries (a
   bounded-size driver result, same contract as IVF centroid training —
   at 100 TB you'd sample; approxQuantile already bounds its error),
2. a binary-search CASE tree assigns each value its QUANTILE bucket
   ordinal (JVM expression, O(log buckets) comparisons per row),
3. bit-interleave the ordinals into the Z-value with shiftleft/bitwise
   OR folded in a single expression tree,
4. repartitionByRange(z) + sortWithinPartitions(z) and write parquet.

Step 4 is exactly how Delta OPTIMIZE ZORDER BY executes; we produce the
same layout with open APIs. Verified in tests/test_layout.py: after
z-ordering, per-file footer min/max spans of BOTH dimensions shrink to
a fraction of the global span (both-column skipping), where a plain
sort only shrinks the leading column's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_ordinal(col: str, boundaries: list[float], bits: int) -> F.Column:
    """``bits``-wide QUANTILE bucket ordinal of ``col``: the count of
    distinct interior quantile boundaries <= value — computed by a
    binary-search CASE tree (O(log n) comparisons per row, pure JVM
    expression) — then rescaled onto the full [0, 2^bits) ordinal space.

    Binning against the ACTUAL quantile boundaries — not an equal-width
    grid over [min, max] — is what makes the curve skew-proof: on a
    skewed column equal-width binning collapses most rows into a few
    buckets and the z-curve loses that dimension entirely. Duplicate
    boundaries (heavy discrete values) are deduped, which compacts a
    low-cardinality column's buckets into 0..n_buckets-1; the final
    ``(ordinal * 2^bits) div n_buckets`` stretch spreads those compact
    ordinals across the HIGH bits too, so the column still steers the
    curve's coarse structure instead of only its low-order wiggles.
    Constant columns degenerate to ordinal 0 and contribute nothing to
    the curve. Nulls land in bucket 0."""
    # a boundary equal to the global min is below-or-equal to EVERY value:
    # it would shift all ordinals uniformly (wasting a bucket) and make a
    # constant column — whose quantiles all equal its min — emit nonzero
    # ordinals instead of dropping out of the curve
    interior = sorted({b for b in boundaries[1:-1] if b > boundaries[0]})
    if not interior:
        return F.lit(0)
    v = F.col(col).cast("double")

    def search(lo: int, hi: int) -> F.Column:
        # invariant: all interior[< lo] <= v and (hi+1 < n implies v < interior[hi+1]);
        # at lo > hi, lo == count of boundaries <= v == the bucket ordinal
        if lo > hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(v >= F.lit(float(interior[mid])), search(mid + 1, hi)).otherwise(
            search(lo, mid - 1)
        )

    n_buckets = len(interior) + 1
    return F.floor(search(0, len(interior) - 1) * F.lit(2**bits) / F.lit(n_buckets)).cast("int")


def zvalue(df: DataFrame, cols: list[str], bits: int = 8) -> F.Column:
    """Z-curve value over ``cols``: interleave the ``bits``-wide bucket
    ordinals of each column, bit by bit (column i contributes bit b to
    curve position b*len(cols)+i). One expression tree, no shuffle."""
    n_cols = len(cols)
    assert 1 <= n_cols * bits <= 63, "z-value must fit a signed long"
    quantiles = [i / (2**bits) for i in range(2**bits + 1)]
    ordinals = []
    for c in cols:
        bounds = df.stat.approxQuantile(c, quantiles, 0.001)
        ordinals.append(_bucket_ordinal(c, bounds, bits))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, ordinal in enumerate(ordinals):
            bit = F.shiftright(ordinal, b).bitwiseAND(F.lit(1)).cast("long")
            z = z + F.shiftleft(bit, b * n_cols + i)
    return z


def write_zordered(df: DataFrame, path: str, cols: list[str], bits: int = 8, files: int | None = None) -> None:
    """Write ``df`` re-clustered along the Z-curve of ``cols``.

    repartitionByRange on the z-value gives each output file a
    contiguous curve segment (range exchange samples the distribution,
    so files are balanced even when the curve is skewed);
    sortWithinPartitions tightens per-row-group stats inside each file."""
    z = zvalue(df, cols, bits)
    out = df.withColumn("__z", z)
    n = files or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    (
        out.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_spans(path: str, cols: list[str]) -> dict[str, float]:
    """Layout diagnostic: mean per-file (min,max) span of each column as
    a fraction of its global span — the file-skipping figure of merit
    (lower = a point/range predicate on that column touches fewer
    files). Reads only parquet footers."""
    import glob as _glob

    import pyarrow.parquet as pq

    paths = sorted(_glob.glob(f"{path}/part-*.parquet"))
    spans: dict[str, list[tuple[float, float]]] = {c: [] for c in cols}
    for p in paths:
        md = pq.ParquetFile(p).metadata
        per_file: dict[str, tuple[float, float]] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in spans and col.statistics is not None:
                    mn, mx = float(col.statistics.min), float(col.statistics.max)
                    if name in per_file:
                        pmn, pmx = per_file[name]
                        per_file[name] = (min(pmn, mn), max(pmx, mx))
                    else:
                        per_file[name] = (mn, mx)
        for name, (mn, mx) in per_file.items():
            spans[name].append((mn, mx))
    out: dict[str, float] = {}
    for c, ranges in spans.items():
        gmin = min(r[0] for r in ranges)
        gmax = max(r[1] for r in ranges)
        width = (gmax - gmin) or 1.0
        out[c] = sum((r[1] - r[0]) / width for r in ranges) / len(ranges)
    return out
