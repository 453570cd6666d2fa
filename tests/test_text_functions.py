"""Text-function unit tests on literal frames (engine-internal checks;
cross-engine equivalence is the oracle gate's job)."""

from __future__ import annotations

import hashlib

from cs422pp_mapreduce_spark.functions.text import (
    fingerprint_md5,
    lang_id_expr,
    token_count_bpe,
    token_count_ws,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_token_count_ws(spark):
    assert _one(spark, "a  b\tc\nd", token_count_ws("text")) == 4
    assert _one(spark, "", token_count_ws("text")) == 0


def test_token_count_bpe(spark):
    # "hello, world42!" → hello , world 42 ! = 5
    assert _one(spark, "hello, world42!", token_count_bpe("text")) == 5


def test_fingerprint_matches_hashlib(spark):
    text = "  The Quick FOX  "
    expected = hashlib.md5(text.strip().lower().encode()).hexdigest()
    assert _one(spark, text, fingerprint_md5("text")) == expected


def test_lang_id_votes(spark):
    assert _one(spark, "the cat is on a mat", lang_id_expr("text")) == "en"
    assert _one(spark, "le chat et la mer", lang_id_expr("text")) == "fr"
    assert _one(spark, "xyzzy plugh", lang_id_expr("text")) == "und"


def test_lang_id_tiebreak_order(spark):
    # one 'the' (en) + one 'le' (fr) → tie → fixed order picks en
    assert _one(spark, "the le", lang_id_expr("text")) == "en"
