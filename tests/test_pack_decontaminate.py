"""Invariants for sequence packing and benchmark decontamination.

Cross-engine value equality is the oracle gate's job; these pin the
properties the hash can't see: the distributed prefix sum equals the
naive single-window plan bit-for-bit, packing conserves the token
axis, and contamination flags never land on the eval slice itself.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cs422pp_mapreduce_spark.operators.dedup import (
    DECONTAM_K,
    EVAL_PCT,
    q_decontaminate,
    word_shingles,
)
from cs422pp_mapreduce_spark.operators.textops import (
    SEQ_LEN,
    chunk_docs,
    q_seq_pack,
)
from cs422pp_mapreduce_spark.sources.catalog import load_table


def _naive_pack(chunks):
    """The single-window formulation (one-task; test-scale only)."""
    w = Window.orderBy("doc_id", "chunk_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    start = F.coalesce(F.sum("n_chunk_tokens").over(w), F.lit(0))
    return chunks.select(
        "doc_id",
        "chunk_id",
        "n_chunk_tokens",
        F.floor(start / SEQ_LEN).cast("long").alias("seq_id"),
        (start % SEQ_LEN).cast("long").alias("seq_off"),
    )


def test_seq_pack_equals_naive_window(spark, sf_dir):
    """Range-exchange + offset-merge packing must be bit-identical to
    the unpartitioned-window plan it replaces at scale."""
    chunks = chunk_docs(load_table(spark, sf_dir, "documents"))
    distributed = q_seq_pack(spark, sf_dir)
    naive = _naive_pack(chunks)
    assert distributed.exceptAll(naive).count() == 0
    assert naive.exceptAll(distributed).count() == 0


def test_seq_pack_conserves_token_axis(spark, sf_dir):
    """Packing is a relabeling of one global token axis: offsets are
    in-range, the axis starts at sequence 0 offset 0, and total packed
    tokens equal total chunk tokens."""
    packed = q_seq_pack(spark, sf_dir).persist()
    bad = packed.where(
        (F.col("seq_off") < 0) | (F.col("seq_off") >= SEQ_LEN)
    ).count()
    assert bad == 0
    first = packed.orderBy("doc_id", "chunk_id").first()
    assert first["seq_id"] == 0 and first["seq_off"] == 0
    # the last chunk's global start == sum of all earlier chunk tokens
    total = packed.agg(F.sum("n_chunk_tokens").cast("long")).first()[0]
    last = packed.orderBy(F.desc("doc_id"), F.desc("chunk_id")).first()
    assert (
        last["seq_id"] * SEQ_LEN + last["seq_off"]
        == total - last["n_chunk_tokens"]
    )


def _eval_ids(docs):
    return {
        r["doc_id"]
        for r in docs.select("doc_id").collect()
        if int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:6], 16)
        % 100
        < EVAL_PCT
    }


def test_decontaminate_flags_only_train_docs_with_real_overlap(spark, sf_dir):
    """No eval doc may flag itself, and every flagged train doc must
    genuinely share a shingle with the eval slice (checked against an
    independently-built shingle index)."""
    docs = load_table(spark, sf_dir, "documents")
    eval_ids = _eval_ids(docs)
    assert eval_ids, "fixture should contain at least one eval doc"
    flagged = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in q_decontaminate(spark, sf_dir).collect()
    }
    assert not (set(flagged) & eval_ids)
    # independent recompute of the overlap set via a raw shingle join
    sh = docs.select(
        "doc_id", word_shingles("text", DECONTAM_K).alias("s")
    )
    rows = {r["doc_id"]: set(r["s"]) for r in sh.collect()}
    eval_shingles = set().union(*(rows[d] for d in eval_ids))
    expected = {
        d: len(s & eval_shingles)
        for d, s in rows.items()
        if d not in eval_ids and s & eval_shingles
    }
    assert flagged == expected


def test_doc_repetition_matches_python_recompute(spark, sf_dir):
    """Every repetition metric recomputed independently in Python must
    match exactly (integer-ratio divisions are IEEE-exact)."""
    from collections import Counter

    from cs422pp_mapreduce_spark.operators.textops import q_doc_repetition

    docs = load_table(spark, sf_dir, "documents").collect()
    expected = {}
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t]
        if len(toks) < 3:
            continue
        bgs = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        tgs = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        top = max(Counter(bgs).values())
        expected[r["doc_id"]] = (
            len(toks),
            (len(toks) - len(set(toks))) / len(toks),
            (len(bgs) - len(set(bgs))) / len(bgs),
            (len(tgs) - len(set(tgs))) / len(tgs),
            top,
            top / len(bgs),
        )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_token_frac"],
            r["dup_bigram_frac"],
            r["dup_trigram_frac"],
            r["top_bigram_count"],
            r["top_bigram_frac"],
        )
        for r in q_doc_repetition(spark, sf_dir).collect()
    }
    assert got == expected


def test_corpus_to_sequences_excludes_eval_and_flagged(spark, sf_dir):
    """The flagship pipeline's output may contain no eval-slice doc and
    no doc the standalone decontaminate query flags; surviving chunks
    must carry a dense, valid packing."""
    from cs422pp_mapreduce_spark.operators.corpus import (
        q_corpus_to_sequences,
    )
    from cs422pp_mapreduce_spark.operators.dedup import q_decontaminate
    from cs422pp_mapreduce_spark.operators.textops import SEQ_LEN

    out = q_corpus_to_sequences(spark, sf_dir).persist()
    out_docs = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    eval_ids = _eval_ids(load_table(spark, sf_dir, "documents"))
    flagged = {r["doc_id"] for r in q_decontaminate(spark, sf_dir).collect()}
    assert not (out_docs & eval_ids)
    assert not (out_docs & flagged)
    bad = out.where(
        (F.col("seq_off") < 0) | (F.col("seq_off") >= SEQ_LEN)
    ).count()
    assert bad == 0


def test_pps_sample_grid_invariants(spark, sf_dir):
    """PPS systematic sampling: the total pick count equals the grid
    size floor(total/step) (within the +2 flooring slack of
    step = total div K), a document never receives more picks than
    ceil(w/step), and every selected doc's interval genuinely
    contains a grid multiple."""
    from cs422pp_mapreduce_spark.operators.textops import PPS_K, q_pps_sample
    from cs422pp_mapreduce_spark.sources.catalog import load_table

    rows = q_pps_sample(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    total = sum(docs.values())
    step = max(total // PPS_K, 1)
    picks = sum(r["n_picks"] for r in rows)
    assert picks == total // step
    assert PPS_K <= picks <= PPS_K + 2
    for r in rows:
        assert r["w"] == docs[r["doc_id"]]
        assert r["n_picks"] <= -(-r["w"] // step) + 1
        # interval (before, before+w] contains n_picks grid multiples
        assert (r["before"] + r["w"]) // step - r["before"] // step == r["n_picks"]
