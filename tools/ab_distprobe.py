"""Isolated A/B harness for the embedding_ivfpq_distributed_topk search
tail (r16, r15 verdict item 3): baseline vs unrolled ADC expression vs a
manual two-level (per-cell, then global) shortlist, interleaved reps +
an exact output-equality check. Findings (committed in
OPTIMIZATION_r16.md): the plan already runs all-broadcast joins with
WindowGroupLimit map-side top-k; the unroll is a wash, the manual
two-level LOSES (WindowGroupLimit already partial-limits before the
exchange), and the remaining cost is the candidate-set ADC compute
floor. Paths are local-tempdir fixtures; run standalone."""
import sys, time, os
sys.path.insert(0, "/root/repo")
from lakehouse_spark_spark.session import get_session
from pyspark.sql import functions as F, Window

spark = get_session("distab")
spark.range(64).mapInPandas(lambda it: it, "id long").write.mode("overwrite").format("noop").save()
from lakehouse_spark_spark.plans.queries import _t, _bloom_fixture_dir
from lakehouse_spark_spark.operators.annindex import load_ann_index, _pruned_cells_scan, write_ann_index
from lakehouse_spark_spark.operators.similarity import adc_dist, sq_dist

sf_dir = "/root/testdata/sf0.1"
path = _bloom_fixture_dir(f"annidx:{sf_dir}", fresh=False)
if not os.path.exists(os.path.join(path, "__fixture_ready")):
    write_ann_index(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding", path, n_cells=16, m=8, k=16)
    open(os.path.join(path, "__fixture_ready"), "w").close()
idx = load_ann_index(spark, path)
emb = _t(spark, sf_dir, "embeddings")
n_copies = max(1, 10_000 // emb.count())
probes_src = emb.select(
    "vec_id", "embedding",
    F.explode(F.sequence(F.lit(0), F.lit(n_copies - 1))).alias("__j"),
).select(
    (F.col("vec_id") + F.col("__j") * F.lit(10_000_000)).alias("vec_id"),
    F.transform("embedding", lambda x: x * (F.lit(1.0) + F.col("__j") / F.lit(1000.0))).alias("embedding"),
)
import pandas as pd
cents, books = idx.centroids, idx.codebooks
q = (probes_src.select(F.col("vec_id").alias("query_id"),
                   F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("__qv"))
     .repartition(spark.sparkContext.defaultParallelism)
     .localCheckpoint(eager=True))
def lut_batches(batches):
    import numpy as np
    from lakehouse_spark_spark.operators.similarity import ivfpq_probe_luts_np
    for pdf in batches:
        if len(pdf) == 0:
            yield pd.DataFrame({"query_id": [], "cell": [], "lut": []}); continue
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["__qv"]])
        cells, luts = ivfpq_probe_luts_np(X, cents, books, 4)
        b, p = cells.shape
        yield pd.DataFrame({"query_id": pdf["query_id"].to_numpy().repeat(p),
                            "cell": cells.reshape(-1),
                            "lut": list(luts.reshape(b * p, -1))})
probes = q.mapInPandas(lut_batches, schema="query_id bigint, cell int, lut array<double>").localCheckpoint(eager=True)
probed_cells = sorted(r["cell"] for r in probes.select("cell").distinct().collect())
m, kk = len(books), len(books[0])

def adc_unrolled(m, kk):
    terms = [F.element_at(F.col("lut"), (F.lit(j * kk) + F.element_at(F.col("codes"), j + 1) + 1).cast("int")) for j in range(m)]
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return F.lit(0.0) + s  # keep the 0.0+ seed so the sum order matches aggregate()

coded = (_pruned_cells_scan(idx, probed_cells)
         .select(F.col("vec_id").alias("neighbor_id"), "cell", "codes")
         .dropDuplicates(["neighbor_id", "cell"]))
cand = coded.join(probes, "cell").filter(F.col("query_id") != F.col("neighbor_id"))

def tail(scored, two_level):
    if two_level:
        w_pc = Window.partitionBy("cell", "query_id").orderBy(F.col("adc_dist").asc(), F.col("neighbor_id"))
        pre = scored.withColumn("__pr", F.row_number().over(w_pc)).filter(F.col("__pr") <= 32).drop("__pr")
    else:
        pre = scored
    w_sl = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("neighbor_id"))
    sl = pre.withColumn("__r", F.row_number().over(w_sl)).filter(F.col("__r") <= 32)
    vecs = (_pruned_cells_scan(idx, probed_cells)
            .select(F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("__cv"))
            .dropDuplicates(["neighbor_id"]))
    exact = (sl.select("query_id", "neighbor_id").join(q, "query_id").join(vecs, "neighbor_id")
             .select("query_id", "neighbor_id", sq_dist().alias("sq_dist")))
    w = Window.partitionBy("query_id").orderBy(F.col("sq_dist").asc(), F.col("neighbor_id"))
    return exact.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)

variants = {
  "baseline": lambda: tail(cand.select("query_id", "cell", "neighbor_id", adc_dist(m, kk).alias("adc_dist")), False),
  "unrolled": lambda: tail(cand.select("query_id", "cell", "neighbor_id", adc_unrolled(m, kk).alias("adc_dist")), False),
  "unrolled+2lvl": lambda: tail(cand.select("query_id", "cell", "neighbor_id", adc_unrolled(m, kk).alias("adc_dist")), True),
  "baseline+2lvl": lambda: tail(cand.select("query_id", "cell", "neighbor_id", adc_dist(m, kk).alias("adc_dist")), True),
}
import itertools
res = {k: [] for k in variants}
for rnd in range(3):
    for name, fn in variants.items():
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        res[name].append(round(time.perf_counter()-t0, 3))
for name, ts in res.items():
    print(name, ts, "min", min(ts))
# equality check: baseline vs unrolled+2lvl
a = variants["baseline"]().orderBy("query_id","rank").collect()
b = variants["unrolled+2lvl"]().orderBy("query_id","rank").collect()
print("EQUAL" if a == b else "MISMATCH", len(a), len(b))
