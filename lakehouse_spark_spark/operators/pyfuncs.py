"""The Python UDF family, demonstrated deliberately — and measured.

This engine keeps ALL hot-path logic in built-in column expressions
(whole-stage codegen). These wrappers exist to (a) complete the API
surface (scalar Pandas UDF, UDTF; grouped-map and mapInPandas live in
plans/queries and operators/multimodal), and (b) quantify the cost of
dropping out of the JVM: tests compare the vectorized UDF against the
equivalent built-in expression for both identical results and relative
speed. Use the built-in unless the logic genuinely cannot be expressed.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("long")
def pandas_token_count(texts: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) whitespace token count — the Pandas-UDF
    twin of operators/text.n_tokens. Same normalization: lower, trim,
    collapse whitespace, split on single spaces."""
    norm = texts.str.replace(r"\s+", " ", regex=True).str.strip().str.lower()
    return norm.str.split(" ").str.len().astype("int64")


@udtf(returnType="sentence: string, sentence_idx: int")
class SplitSentences:
    """UDTF: one text row → one row per (crudely) detected sentence.
    The table-function form of text processing — output cardinality is
    data-dependent, which scalar UDFs cannot express."""

    # Trim EXACTLY the regex \s class (ASCII whitespace), not Python
    # str.strip()'s full Unicode set: the corpus carries literal C0
    # controls (e.g. \x1f) that Python considers whitespace but \s does
    # not — str.strip() would silently drop them at segment edges and
    # diverge from any \s-based reimplementation (incl. the DuckDB
    # oracle in plans/queries.py::doc_sentences_udtf).
    _WS = " \t\n\r\f\v"

    def eval(self, text: str):
        if text is None:
            return
        import re

        parts = [s.strip(self._WS) for s in re.split(r"[.!?]+", text)]
        for i, s in enumerate(p for p in parts if p):
            yield s, i


def token_counts_vectorized(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(F.col(id_col), pandas_token_count(F.col(text_col)).alias("n_tokens"))


def explode_sentences(spark, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Lateral-join the UDTF over every document."""
    docs.createOrReplaceTempView("__udtf_docs")
    spark.udtf.register("split_sentences", SplitSentences)
    return spark.sql(
        f"SELECT d.{id_col}, s.sentence, s.sentence_idx "
        f"FROM __udtf_docs d, LATERAL split_sentences(d.{text_col}) s"
    )
