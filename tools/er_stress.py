"""One-dominant-block ER stress (round-7 verdict ask #1): every doc in
ONE (lang, source) block — the worst case for the old (lang, source)
blocking, where the match self-join is O(n²) in the corpus. The
round-7 canopy generator (`_er_candidate_pairs`: shared prefix 4-gram
+ per-(lang, source, gram) posting-list cap) must keep the CANDIDATE
count sub-quadratic: doubling n must grow candidates by far less than
4x, and the absolute count must sit at a tiny fraction of n(n-1)/2.

Usage:  python tools/er_stress.py [n_base] [factor]
Prints one JSON line with candidate counts, growth exponents, and the
pair counts actually matched (planted near-dups must still be found).
"""

from __future__ import annotations

import json
import math
import random
import sys

sys.path.insert(0, "/root/repo")


def make_docs(spark, n: int, seed: int = 7):
    """n docs, ALL in (lang=en, source=common_crawl). 2% of docs are
    planted near-dups (one-word typo of a base doc); the rest are
    random 12-word sentences over a 4000-word vocabulary."""
    rng = random.Random(seed)
    vocab = [f"w{i:04d}" for i in range(4000)]
    rows = []
    for i in range(n):
        if i % 50 == 1 and i > 1:
            # near-dup of the previous doc: flip one word
            words = rows[-1][3].split()
            words[rng.randrange(len(words))] = rng.choice(vocab)
            text = " ".join(words)
        else:
            text = " ".join(rng.choice(vocab) for _ in range(12))
        rows.append((i, "en", "common_crawl", text))
    return spark.createDataFrame(rows, "doc_id BIGINT, lang STRING, source STRING, text STRING")


def measure(spark, n: int) -> dict:
    from pyspark.sql import functions as F

    from lakehouse_spark_spark.operators.text import norm_text
    from lakehouse_spark_spark.plans.queries import _er_candidate_pairs

    docs = make_docs(spark, n)
    d = docs.select("doc_id", "lang", "source", F.substring(norm_text("text"), 1, 40).alias("pfx"))
    cand = _er_candidate_pairs(d)
    n_cand = cand.count()
    n_match = cand.filter(F.levenshtein("__pa", "__pb") <= 10).count()
    return {
        "n_docs": n,
        "all_pairs": n * (n - 1) // 2,
        "candidates": n_cand,
        "candidate_fraction": round(n_cand / (n * (n - 1) / 2), 6),
        "matched_pairs": n_match,
    }


def main() -> None:
    from lakehouse_spark_spark.session import get_session

    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_session("er_stress")
    lo = measure(spark, n_base)
    hi = measure(spark, n_base * factor)
    # empirical growth exponent: candidates ~ n^e => e = log ratio / log factor
    e = math.log(max(hi["candidates"], 1) / max(lo["candidates"], 1)) / math.log(factor)
    print(
        json.dumps(
            {
                "stress": "er_one_dominant_block",
                "base": lo,
                "scaled": hi,
                "growth_exponent": round(e, 3),
                "quadratic_would_be": 2.0,
                "sub_quadratic": e < 1.5,
            }
        )
    )


if __name__ == "__main__":
    main()
