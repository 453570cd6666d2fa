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


def test_mixture_rebalance_hits_target_shares(spark, sf_dir):
    """The binding language keeps rate 1.0 (bp 10000); every kept-token
    share lands within hash-sampling noise of TARGET_MIX; en is
    actually downsampled (it dominates the raw corpus)."""
    from pyspark.sql import functions as F

    from cs422pp_mapreduce_spark.operators.textops import (
        MIX_BP,
        TARGET_MIX,
        q_mixture_rebalance,
    )

    kept = q_mixture_rebalance(spark, sf_dir)
    rates = {
        r["lang"]: r["keep_bp"]
        for r in kept.select("lang", "keep_bp").distinct().collect()
    }
    assert max(rates.values()) == MIX_BP  # the scarcest lang binds at 1.0
    assert rates["en"] < MIX_BP  # the dominant lang is downsampled
    shares = {
        r["lang"]: r["tok"]
        for r in kept.groupBy("lang").agg(F.sum("n_tok").alias("tok")).collect()
    }
    total = sum(shares.values())
    for lang, target in TARGET_MIX.items():
        # hash-mod sampling is binomial-noisy at small n; 25% relative
        assert abs(shares[lang] / total - target) / target < 0.25, lang


def test_unigram_logprob_orders_docs_sensibly(spark, sf_dir):
    """A doc made of the corpus's most common tokens must score lower
    (more likely) than one full of rare tokens; scores are positive."""
    from pyspark.sql import functions as F

    from cs422pp_mapreduce_spark.operators.textops import q_unigram_logprob

    nll = q_unigram_logprob(spark, sf_dir)
    rows = nll.agg(
        F.min("mean_nll").alias("lo"), F.max("mean_nll").alias("hi")
    ).collect()[0]
    assert 0.0 < rows["lo"] < rows["hi"]
    # weighted corpus-level mean NLL == unigram entropy of the corpus:
    # bounded by ln(vocab)
    import math

    ent = nll.agg(
        (
            F.sum(F.col("mean_nll") * F.col("n_tok")) / F.sum("n_tok")
        ).alias("h")
    ).collect()[0]["h"]
    vocab = (
        q_unigram_logprob.__module__  # noqa: B018 — keep flake quiet
    )
    from cs422pp_mapreduce_spark.functions.text import nonempty_tokens
    from cs422pp_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_vocab = (
        docs.select(F.explode(nonempty_tokens("text")).alias("t"))
        .agg(F.countDistinct("t"))
        .collect()[0][0]
    )
    assert ent <= math.log(n_vocab) + 1e-6


def test_source_dup_stats_consistent_with_exact_dedup(spark, sf_dir):
    from pyspark.sql import functions as F

    from cs422pp_mapreduce_spark.operators.dedup import q_source_dup_stats

    stats = q_source_dup_stats(spark, sf_dir)
    tot = stats.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_prefix_dups").alias("dups")
    ).collect()[0]
    # fixtures have prefix duplicates (shared ledes) but no exact dups
    assert tot["docs"] > tot["dups"] > 0
    bad = stats.where(
        (F.col("prefix_dup_rate") < 0)
        | (F.col("prefix_dup_rate") >= 1)
        | (F.col("n_unique_prefix") > F.col("n_unique_exact"))
    ).count()
    assert bad == 0


def test_winnow_matches_python_replica_and_guarantee(spark, sf_dir):
    """Winnowing invariants: Spark fingerprints equal a hashlib-based
    Python replica, and every W-window of k-gram hashes contributes
    its minimum (the ≥K+W−1-token shared-run guarantee)."""
    import hashlib

    from cs422pp_mapreduce_spark.operators.textops import (
        WINNOW_K,
        WINNOW_W,
        q_doc_winnow,
    )

    got = {}
    for r in q_doc_winnow(spark, sf_dir).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_checked = 0
    for row in docs.collect():
        t = [x for x in row.text.split(" ") if x != ""]
        if len(t) < WINNOW_K:
            assert row.doc_id not in got
            continue
        hs = [
            int(
                hashlib.md5(
                    " ".join(t[i : i + WINNOW_K]).encode()
                ).hexdigest()[:15],
                16,
            )
            for i in range(len(t) - WINNOW_K + 1)
        ]
        want = {
            min(hs[j : j + WINNOW_W])
            for j in range(max(len(hs) - WINNOW_W + 1, 1))
        }
        assert got.get(row.doc_id) == want, row.doc_id
        n_checked += 1
    assert n_checked > 0


def test_hybrid_rrf_fuses_component_rankings(spark, sf_dir):
    """q_hybrid_rrf must equal a driver-side RRF recompute from its two
    component queries' own outputs: ranks assigned over the BM25 pool
    (round-6 score desc, doc_id) and the cosine pool (round-4 sim desc,
    vec_id), score = 1/(K+lex_rank) + 1/(K+vec_rank) with missing
    terms 0, top-RRF_OUT by (score desc, doc_id)."""
    from cs422pp_mapreduce_spark.operators.similarity import (
        QUERY_VEC_ID,
        _as_double,
        cosine,
    )
    from cs422pp_mapreduce_spark.operators.textops import (
        BM25_TOPK,
        RRF_K,
        RRF_OUT,
        q_bm25_topk,
        q_hybrid_rrf,
    )
    from cs422pp_mapreduce_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    lex_pool = q_bm25_topk(spark, sf_dir).collect()
    lex_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(lex_pool, key=lambda r: (-r["score"], r["doc_id"]))
        )
    }
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(
        _as_double("embedding").alias("qvec")
    )
    sims = (
        emb.where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            (F.round(cosine(_as_double("embedding"), F.col("qvec")), 4) + 0.0)
            .alias("sim"),
        )
        .collect()
    )
    vec_rank = {
        r["vec_id"]: i + 1
        for i, r in enumerate(
            sorted(sims, key=lambda r: (-r["sim"], r["vec_id"]))[:BM25_TOPK]
        )
    }
    fused = {}
    for d in set(lex_rank) | set(vec_rank):
        s = 0.0
        if d in lex_rank:
            s += 1.0 / (RRF_K + lex_rank[d])
        if d in vec_rank:
            s += 1.0 / (RRF_K + vec_rank[d])
        fused[d] = s
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:RRF_OUT]

    got = q_hybrid_rrf(spark, sf_dir).collect()
    assert [(r["doc_id"], round(r["rrf_score"], 6)) for r in got] == [
        (d, round(s, 6)) for d, s in want
    ]
    for r in got:
        assert r["lex_rank"] == lex_rank.get(r["doc_id"])
        assert r["vec_rank"] == vec_rank.get(r["doc_id"])
        # every fused doc came from at least one pool
        assert r["lex_rank"] is not None or r["vec_rank"] is not None


def test_bigram_logprob_matches_python_replica(spark, sf_dir):
    """Exact replica of the interpolated-bigram LM on the smoke corpus:
    same counts, same 0.7/0.3 literals, same per-transition 6-decimal
    rounding, same decimal-routed mean."""
    import math

    import pytest
    from collections import Counter
    from decimal import Decimal

    from cs422pp_mapreduce_spark.operators.textops import (
        BIGRAM_BACKOFF,
        BIGRAM_LAMBDA,
        q_bigram_logprob,
    )
    from cs422pp_mapreduce_spark.sources.catalog import load_table

    docs = {
        r["doc_id"]: [w for w in r["text"].split(" ") if w]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    uni: Counter = Counter()
    big: Counter = Counter()
    ctx: Counter = Counter()
    per_doc: dict[int, Counter] = {}
    for d, t in docs.items():
        uni.update(t)
        pairs = list(zip(t, t[1:]))
        if pairs:
            per_doc[d] = Counter(pairs)
            big.update(pairs)
            for w1, _ in pairs:
                ctx[w1] += 1
    total = sum(uni.values())
    expect = {}
    for d, tf in per_doc.items():
        s = Decimal(0)
        n = 0
        for (w1, w2), k in tf.items():
            p = BIGRAM_LAMBDA * (big[(w1, w2)] / ctx[w1]) + BIGRAM_BACKOFF * (
                uni[w2] / total
            )
            nll = round(Decimal(str(round(-math.log(p), 6))), 6)
            s += k * nll
            n += k
        expect[d] = (float(s) / n, n)
    got = {
        r["doc_id"]: (r["mean_nll_bigram"], r["n_transitions"])
        for r in q_bigram_logprob(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for d, (m, n) in got.items():
        assert n == expect[d][1]
        assert m == pytest.approx(expect[d][0], abs=1e-12)
