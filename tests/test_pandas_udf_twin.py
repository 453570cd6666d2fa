"""Arrow pandas_udf ≡ JVM expression equivalence.

The engine's rule (SURVEY.md §4): hot paths stay JVM-side; Python is
allowed only Arrow-batched and only where built-ins can't express the
kernel (media decode). This test proves the two paths agree where they
overlap — a vectorized pandas_udf twin of the whitespace token count
matches the codegen'd expression row-for-row — so swapping a Python
kernel in (e.g. a real tokenizer) preserves semantics, and the
fallback cost is measured in BASELINE.md, not correctness.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cs422pp_mapreduce_spark.functions.text import token_count_ws
from cs422pp_mapreduce_spark.sources.catalog import load_table


def token_count_ws_py():
    # created lazily: pandas_udf registration needs an active session
    @pandas_udf("long")
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.str.split().map(len).astype("int64")

    return _udf


def test_pandas_udf_matches_jvm_expression(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    both = docs.select(
        token_count_ws("text").alias("jvm"),
        token_count_ws_py()("text").alias("py"),
    )
    assert both.where(F.col("jvm") != F.col("py")).count() == 0
    assert both.count() > 0


def test_pandas_udf_runs_arrow_batched(spark, sf_dir):
    # ArrowEvalPython (vectorized), never BatchEvalPython (row-at-a-time)
    from cs422pp_mapreduce_spark.plans.explain import explain_str

    docs = load_table(spark, sf_dir, "documents")
    plan = explain_str(docs.select(token_count_ws_py()("text").alias("n")))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
