"""Text-analysis queries over the ``documents`` table.

The training-data-pipeline text surface (lang-id, quality scoring,
token counting, fingerprinting) built entirely from the JVM-side
expressions in functions/text.py — no Python in the hot path, so every
query here is a single codegen'd scan + (optional) aggregation and
scales linearly with corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from ..functions.text import (
    fingerprint_md5,
    lang_id_expr,
    nonempty_tokens,
    quality_score_cols,
    token_count_bpe,
    token_count_ws,
)
from ..session import scratch_persist
from ..sources.catalog import load_table


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language: docs, tokens, chars, avg doc len."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(nonempty_tokens("text")).cast("long")
    return (
        docs.select("lang", n_tokens.alias("n_tokens"), "n_chars")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias(
                "avg_tokens_per_doc"
            ),
        )
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-voting language ID per document (heuristic, n-gram-free
    deterministic baseline; a fastText-style model would slot in as a
    pandas UDF without changing the plan shape)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id_expr("text").alias("lang_pred"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals + composite score."""
    docs = load_table(spark, sf_dir, "documents")
    cols = quality_score_cols("text")
    return docs.select(
        "doc_id", *(expr.alias(name) for name, expr in cols.items())
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace and BPE-ish-regex token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_ws("text").alias("n_ws_tokens"),
        token_count_bpe("text").alias("n_bpe_tokens"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5 fingerprint of normalized text per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_md5("text").alias("fp"))


WINNOW_K = 5  # k-gram width for winnowing
WINNOW_W = 4  # winnow window: guarantees a match on any ≥ K+W-1-token overlap


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """Winnowing core over any (doc_id, text) frame — batch or
    streaming (stateless map-only expressions, so the identical plan
    runs under readStream in append mode, like chunk_docs)."""
    toks = docs.select("doc_id", nonempty_tokens("text").alias("t")).where(
        F.size("t") >= WINNOW_K
    )
    shingle_hash = lambda i: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.array_join(F.slice("t", i, WINNOW_K), " ")), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    hashes = F.transform(
        F.sequence(F.lit(1), F.size("t") - (WINNOW_K - 1)), shingle_hash
    )
    toks = toks.select("doc_id", hashes.alias("hs"))
    wins = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size("hs") - (WINNOW_W - 1), F.lit(1))
        ),
        lambda j: F.array_min(F.slice("hs", j, WINNOW_W)),
    )
    return (
        toks.select("doc_id", F.explode(F.array_distinct(wins)).alias("fp"))
    )


def q_doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al. 2003, "Winnowing:
    Local Algorithms for Document Fingerprinting" — the MOSS
    algorithm): hash every WINNOW_K-token shingle, slide a WINNOW_W
    window over the hash sequence, keep each window's minimum. The
    selected set is position-independent and guarantees any shared run
    of ≥ K+W−1 tokens contributes at least one common fingerprint —
    the classic sub-document containment/overlap index (a denser
    cousin of MinHash that preserves locality).

    Entirely within-row array expressions — map-only, zero shuffle
    before the final distinct; at 100 TB this chains onto the scan.
    The shingle hash is the engine's cross-engine convention
    (md5-prefix → bigint, as q_deterministic_sample), so the DuckDB
    oracle reproduces fingerprints exactly."""
    from ..session import default_parallelism

    docs = load_table(spark, sf_dir, "documents").repartition(
        default_parallelism(), "doc_id"
    )
    return winnow_fingerprints(docs)


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample of documents via hash-mod bucketing
    (md5 of the key → bucket 0..99, keep < 10).

    The reproducible alternative to rand()-based ``sample()`` for
    corpus work: membership is a pure function of the key, so the
    sample is stable across runs, engines, partitionings, and data
    re-layouts — which is what makes held-out splits and A/B corpus
    slices auditable. Pure codegen'd expressions, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
        ).cast("bigint")
        % 100
    )
    return docs.select(
        "doc_id", "lang", "source", "n_chars", bucket.alias("sample_bucket")
    ).where(F.col("sample_bucket") < 10)


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, token) TF-IDF with smooth idf = ln((N+1)/(df+1)) + 1
    (sklearn's convention) — the classic relevance weighting a text
    pipeline feeds to retrieval or keyword extraction.

    Shape: explode tokens → tf per (doc, token) [one shuffle] → df per
    token from the tf table [second shuffle, input already one row per
    (doc, token)] → broadcast both the single-row corpus count and the
    df side back onto tf. The tf table is persisted because Spark does
    not share the subplan between the tf and df branches of the join —
    without it the corpus is tokenized twice, the dominant cost at
    scale (plan-audited; the cluster analog is materializing tf once).
    At 100 TB the df table is vocabulary-sized (≪ corpus), so the
    broadcast stays the right plan; ln() output is rounded to 6
    decimals per the engine's libm-vs-JVM convention."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(nonempty_tokens("text")).alias("token")
    )
    tf = (
        toks.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)) + 1
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (F.round(F.col("tf") * idf, 6) + 0.0).alias("tfidf"),
        )
    )


CHUNK_SIZE = 40  # tokens per chunk
CHUNK_STRIDE = 30  # tokens between chunk starts (overlap = 10)


def chunk_docs(docs: DataFrame) -> DataFrame:
    """Chunking core over any (doc_id, text) frame — batch or
    streaming: stateless map-only expressions, so the identical plan
    runs under readStream in append mode (asserted in
    tests/test_streaming_corpus.py)."""
    toks = docs.select("doc_id", nonempty_tokens("text").alias("toks")).where(
        F.size("toks") > 0
    )
    starts = F.sequence(F.lit(1), F.size("toks"), F.lit(CHUNK_STRIDE))
    chunks = toks.select(
        "doc_id", "toks", F.posexplode(starts).alias("chunk_id", "start")
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(
            " ", F.slice("toks", F.col("start"), F.lit(CHUNK_SIZE))
        ).alias("chunk_text"),
        F.least(F.lit(CHUNK_SIZE), F.size("toks") - F.col("start") + 1)
        .cast("long")
        .alias("n_chunk_tokens"),
    )


def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping token-window chunks
    (CHUNK_SIZE tokens, CHUNK_STRIDE stride) — the context-window
    packing step an LLM training pipeline runs before tokenization.

    Shape: tokenize once, posexplode a small per-doc start-offset
    array (sequence), slice the token array per chunk — all codegen'd
    array expressions, zero Python, one narrow explode whose fan-out
    is ceil(tokens/stride) per doc. No shuffle at all: chunking is
    embarrassingly parallel, and at 100 TB it stays a map-only stage
    that chains onto the scan (and runs unchanged as a streaming
    append-mode query — see chunk_docs)."""
    return chunk_docs(load_table(spark, sf_dir, "documents"))


def q_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-stratified corpus deciles — the stratification table a
    data-mixing / curriculum step samples from: rank every doc by
    composite quality score, cut into 10 equal-frequency buckets,
    report per-decile size and score range.

    The global rank is NOT an unpartitioned window (ntile() would
    funnel the corpus through one task): same range-exchange +
    offset-merge shape as q_global_rank, with the total count joined
    back as a broadcast single-row frame instead of a driver collect.
    decile = floor(10·(rank−1)/n), bit-equal to the naive-window
    oracle."""
    from pyspark.sql.window import Window

    from ..session import default_parallelism

    docs = load_table(spark, sf_dir, "documents")
    q = quality_score_cols("text")["quality_score"]
    scored = docs.select("doc_id", q.alias("q"))
    ranged = scored.repartitionByRange(
        default_parallelism(), "q", "doc_id"
    ).withColumn("pid", F.spark_partition_id())
    local_w = Window.partitionBy("pid").orderBy("q", "doc_id")
    # persisted BEFORE branching (q_global_rank note): offsets and the
    # final join must see the same sampled range boundaries
    local = ranged.withColumn(
        "local_rn", F.row_number().over(local_w)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    counts = local.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    offsets = counts.withColumn(
        "offset",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("pid", "offset")
    total = counts.agg(F.sum("cnt").alias("n"))
    ranked = (
        local.join(F.broadcast(offsets), "pid")
        .join(F.broadcast(total))
        .select(
            "q",
            (
                F.floor(
                    F.lit(10)
                    * (F.col("local_rn") + F.col("offset") - 1)
                    / F.col("n")
                )
            ).cast("long").alias("decile"),
        )
    )
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.round(F.min("q"), 6) + 0.0).alias("min_score"),
        (F.round(F.max("q"), 6) + 0.0).alias("max_score"),
    )


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document (docs with ≥3
    tokens): duplicate-token/bigram/trigram fractions plus the mass of
    the single most frequent bigram — the within-document repetition
    gate a pretraining quality pipeline applies before dedup.

    MAP-ONLY since r07 (was explode → two-level aggregate → join):
    every signal, including the top-bigram mass, is within-row array
    math — so a per-doc statistic never pays a shuffle, at any corpus
    size. Since r07 wave 5, only the TOKENS are xxhash64'd (once);
    bigram/trigram fingerprints are NUMERIC combinations of adjacent
    token hashes (xor of a 21-bit rotation — no n-gram string is ever
    materialized, cutting the sf1 wall 6.0 → ~4.4 s warm, scale ratio
    ~8× → ~4× for 10× data with a ~0.7 s tokenize floor; the residual
    cost is the per-row array_sort + fold, linear in corpus size).
    Duplicate fractions are size − size∘array_distinct; the
    most-frequent-bigram count AND the distinct-bigram count come
    from ONE ``F.aggregate`` fold over the sorted hash array (longest
    equal run + number of run starts). Exact up to 64-bit collisions,
    the dedup_ngram principle. Fractions are exact integer-ratio IEEE
    divisions, bit-equal across engines; the oracle keeps the
    readable unnest/GROUP BY formulation — same integers either way.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", nonempty_tokens("text").alias("toks")).where(
        F.size("toks") >= 3
    )

    rot = lambda a, k: F.shiftleft(a, k).bitwiseOR(  # noqa: E731
        F.shiftrightunsigned(a, 64 - k)
    )
    comb = lambda a, b: b.bitwiseXOR(rot(a, 21))  # noqa: E731

    def dup_frac(arr):
        return (F.size(arr) - F.size(F.array_distinct(arr))).cast(
            "double"
        ) / F.size(arr)

    def run_stats(sorted_arr):
        # one pass over the sorted array: longest run of equal
        # adjacent values (== top bigram count) and number of run
        # starts (== distinct count). run == 0 doubles as the "no
        # previous element" flag, so no null sentinel can collide
        # with a real hash value.
        zero = F.struct(
            F.lit(0).cast("long").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
            F.lit(0).cast("long").alias("nd"),
        )

        def merge(acc, x):
            is_run = (acc["run"] > F.lit(0)) & (acc["prev"] == x)
            new_run = F.when(is_run, acc["run"] + 1).otherwise(
                F.lit(1).cast("long")
            )
            return F.struct(
                x.alias("prev"),
                new_run.alias("run"),
                F.greatest(acc["best"], new_run).alias("best"),
                F.when(is_run, acc["nd"]).otherwise(acc["nd"] + 1).alias("nd"),
            )

        return F.aggregate(
            sorted_arr,
            zero,
            merge,
            lambda acc: F.struct(
                acc["best"].alias("best"), acc["nd"].alias("nd")
            ),
        )

    # Project each derived array ONCE before anything references it
    # multiple times (size, array_distinct, the fold): HOFs are
    # CodegenFallback, so no subexpression elimination rescues inline
    # copies — the staged projections are the same fix as
    # shingle_frame (multi-referenced non-trivial aliases are not
    # re-inlined by CollapseProject).
    hashed = toks.select(
        "doc_id", F.transform("toks", lambda s: F.xxhash64(s)).alias("tkh")
    )
    nh = F.size("tkh")
    with_bg = hashed.select(
        "doc_id",
        "tkh",
        F.zip_with(
            F.slice("tkh", 1, nh - 1), F.slice("tkh", 2, nh - 1), comb
        ).alias("bgh"),
    )
    arrs = with_bg.select(
        "doc_id",
        "tkh",
        "bgh",
        # trigram fingerprint = bigram fingerprint ⊕ rot(next token):
        # chaining the combine keeps trigrams numeric too
        F.zip_with(
            F.slice("bgh", 1, F.size("bgh") - 1),
            F.slice("tkh", 3, F.size("tkh") - 2),
            comb,
        ).alias("tgh"),
    )
    folded = arrs.select(
        "doc_id",
        "tkh",
        "bgh",
        "tgh",
        run_stats(F.array_sort("bgh")).alias("rs"),
    )
    return folded.select(
        "doc_id",
        F.size("tkh").cast("long").alias("n_tokens"),
        dup_frac(F.col("tkh")).alias("dup_token_frac"),
        (
            (F.size("bgh") - F.col("rs.nd")).cast("double") / F.size("bgh")
        ).alias("dup_bigram_frac"),
        dup_frac(F.col("tgh")).alias("dup_trigram_frac"),
        F.col("rs.best").alias("top_bigram_count"),
        (F.col("rs.best").cast("double") / F.size("bgh")).alias(
            "top_bigram_frac"
        ),
    )


SEQ_LEN = 512  # training-sequence token budget


def pack_sequences(chunks: DataFrame) -> DataFrame:
    """Concatenate-and-split sequence packing over a
    (doc_id, chunk_id, n_chunk_tokens) frame: lay every chunk out on
    one global token axis in (doc_id, chunk_id) order and cut it into
    fixed SEQ_LEN-token training sequences — the packing step a
    pretraining pipeline runs so no context window is padded. A chunk
    belongs to the sequence where it *starts* (boundary-straddling
    chunks are assigned once, deterministically).

    The global running token total is NOT an unpartitioned window (the
    one-task 100 TB killer). Same shape as q_global_rank
    (relational.py): range-repartition on the order key, per-partition
    running sums, then add per-partition token-total offsets (tiny
    O(partitions) aggregate, cumulative-summed, broadcast back).
    Result is identical to the naive single-window formulation — the
    oracle IS that formulation — because offset + local prefix sum is
    invariant under any contiguous split of a total order."""
    from pyspark.sql.window import Window

    from ..session import default_parallelism

    ranged = chunks.repartitionByRange(
        default_parallelism(), "doc_id", "chunk_id"
    ).withColumn("pid", F.spark_partition_id())
    local_w = (
        Window.partitionBy("pid")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # persisted BEFORE branching: the offsets branch and the final join
    # must see the SAME sampled range boundaries (q_global_rank note).
    local = ranged.withColumn(
        "local_start",
        F.coalesce(F.sum("n_chunk_tokens").over(local_w), F.lit(0)),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    offsets = (
        local.groupBy("pid")
        .agg(F.sum("n_chunk_tokens").alias("toks"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("toks").over(
                    Window.orderBy("pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("pid", "offset")
    )
    start = F.col("local_start") + F.col("offset")
    return local.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "chunk_id",
        "n_chunk_tokens",
        F.floor(start / SEQ_LEN).cast("long").alias("seq_id"),
        (start % SEQ_LEN).cast("long").alias("seq_off"),
    )


def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack document chunks into SEQ_LEN-token training sequences
    (chunking per q_doc_chunk, then distributed prefix-sum packing per
    pack_sequences)."""
    return pack_sequences(chunk_docs(load_table(spark, sf_dir, "documents")))


PPS_K = 100  # systematic-sample grid points (≈ sample size)


def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling (Madow
    1949; the PPS design survey samplers and data-mixture builders
    use): lay every document on one global axis of cumulative weight
    (weight = n_chars — longer docs carry more training signal), drop
    a regular grid of points step = total_weight div PPS_K apart, and
    select the documents the grid points land in. Inclusion
    probability is proportional to weight, the sample size is
    approximately PPS_K (exactly total div step grid picks — the
    floor in step makes this drift above K when total is far from a
    multiple of step), and — unlike rand()-keyed weighted reservoirs —
    membership
    is a pure INTEGER function of the corpus, so the sample is
    identical across engines, partitionings, and reruns: hash-verified,
    not rows-only.

    The cumulative weight is the range-exchange prefix sum
    (pack_sequences / q_global_rank pattern — never an unpartitioned
    window); the grid total is a 1-row broadcast. n_picks =
    (before+w) div step − before div step (a heavy doc spanning
    several grid points is multiply-selected, the PPS-with-replacement
    bookkeeping). All-integer arithmetic end to end."""
    from pyspark.sql.window import Window

    from ..session import default_parallelism

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("w")
    )
    ranged = docs.repartitionByRange(
        default_parallelism(), "doc_id"
    ).withColumn("pid", F.spark_partition_id())
    local_w = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "local_before", F.coalesce(F.sum("w").over(local_w), F.lit(0))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    offsets = (
        local.groupBy("pid")
        .agg(F.sum("w").alias("toks"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("toks").over(
                    Window.orderBy("pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("pid", "offset")
    )
    total = docs.agg(F.sum("w").alias("total_w"))
    cum = (
        local.join(F.broadcast(offsets), "pid")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "w",
            (F.col("local_before") + F.col("offset")).alias("before"),
            F.greatest(
                F.expr(f"total_w div {PPS_K}"), F.lit(1)
            ).alias("step"),
        )
    )
    return cum.select(
        "doc_id",
        "w",
        "before",
        F.expr("(before + w) div step - before div step").alias("n_picks"),
    ).where(F.col("n_picks") >= 1)


def q_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequencies (count >= 5) — the n-gram statistics
    pass behind collocation mining and LM smoothing tables.

    Bigrams come from zip_with over two shifted slices of the token
    array (adjacent-pair join inside the row, no self-join, no
    positional shuffle); the only shuffle is the final count, which
    partial-aggregates map-side first. A deliberately shallow HOF
    stack — wide lambda pyramids blow up Janino codegen (BASELINE.md
    round-1 note)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(nonempty_tokens("text").alias("toks")).where(
        F.size("toks") >= 2
    )
    bigram = F.zip_with(
        F.slice("toks", 1, F.size("toks") - 1),
        F.slice("toks", 2, F.size("toks") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        toks.select(F.explode(bigram).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 5)
    )


# Per-language sampling percentages: oversample low-resource languages,
# downsample the dominant one — the usual corpus-balancing move.
STRATA_PCT = {"en": 5, "de": 10, "es": 20, "fr": 30, "zh": 50}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language keep rates via
    the same hash-mod bucketing as q_deterministic_sample.

    Unlike ``df.sampleBy`` (rand()-seeded, partitioning-sensitive),
    membership is a pure function of the key, so the stratified split
    is reproducible across engines and re-layouts. Pure codegen'd
    expressions, no shuffle, no Python."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
        ).cast("bigint")
        % 100
    )
    rate = F.lit(None).cast("int")
    expr = None
    for lang, pct in STRATA_PCT.items():
        expr = (
            F.when(F.col("lang") == lang, pct)
            if expr is None
            else expr.when(F.col("lang") == lang, pct)
        )
    rate = expr.otherwise(0)
    return docs.select(
        "doc_id",
        "lang",
        bucket.alias("sample_bucket"),
        rate.cast("long").alias("keep_pct"),
    ).where(F.col("sample_bucket") < rate)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the event stream: pseudonymize the user key
    (keyed md5 → stable opaque token) and redact numeric literals in
    the free-form props payload.

    The redaction regex runs JVM-side (codegen'd regexp_replace), the
    pseudonym is a pure hash of the key — so the scrub is a map-only
    stage with no shuffle, and the pseudonym remains joinable across
    tables scrubbed the same way (referential integrity preserved,
    the property GDPR-style pipelines need)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.concat(
            F.lit("u_"),
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 12),
        ).alias("user_pseudo"),
        F.regexp_replace("props", "[0-9]+", "<NUM>").alias("props_redacted"),
        "event_type",
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token → sorted postings list (distinct doc_ids) + document
    frequency — the retrieval-index build as one aggregation.

    collect_set's order is partitioning-dependent; array_sort
    canonicalizes it, and the sorted list is serialized to one
    comma-joined string — the engine-wide convention for
    collection-valued outputs (q_collect_agg, relational.py): the
    driver's canonicalizer hashes scalar cells and cannot sort raw
    array columns (r03 red row). At scale the skew risk is stopword
    tokens with corpus-sized postings; production would cap or tier
    those (they carry no retrieval signal) — here the 31-word
    vocabulary makes every posting list corpus-wide, the worst case,
    which the plan survives because the set is built by partial
    aggregation before the single shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(nonempty_tokens("text")).alias("token")
    )
    return toks.groupBy("token").agg(
        F.array_join(
            F.array_sort(F.collect_set("doc_id")).cast("array<string>"), ","
        ).alias("postings"),
        F.count_distinct("doc_id").alias("df"),
    )


def q_keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per document by TF-IDF — the keyword-extraction
    composition: the tfidf aggregate feeds a per-doc ranking window
    (row_number over tfidf DESC with token tiebreak), which compiles
    to WindowGroupLimit: the top-3 cut applies per partition BEFORE
    the final per-doc sort, so the window shuffle carries candidates,
    not the full (doc, token) matrix. Ranking runs on the rounded
    tfidf both here and in the oracle, so ordering is engine-stable."""
    from pyspark.sql.window import Window

    tfidf = q_tfidf(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        tfidf.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "doc_id",
            "token",
            "tfidf",
            F.col("rn").cast("long").alias("kw_rank"),
        )
    )


# Target language mixture for q_mixture_rebalance: the share of total
# training tokens each language should contribute. en is deliberately
# under its natural share (it dominates the raw corpus) — the op must
# downsample it; the scarcest language relative to its target binds the
# whole mixture (rate 1.0) and everything else scales down.
TARGET_MIX = {"en": 0.30, "de": 0.175, "es": 0.175, "fr": 0.175, "zh": 0.175}
MIX_BP = 10_000  # basis-point resolution of the hash-bucket membership


def _bucket_bp(key: Column | str = "doc_id") -> Column:
    """md5-bucket in [0, MIX_BP) — deterministic_sample's hash-mod
    membership at basis-point resolution."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 6), 16, 10).cast("bigint")
        % MIX_BP
    )


def q_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: downsample each language to hit TARGET_MIX token
    shares — the mixture-rebalancing pass a pretraining pipeline runs
    after cleaning and before packing.

    The keep rate per language is computed FROM the data (two tiny
    aggregates), not hard-coded: scale = min_l(tokens_l / share_l)
    makes the most-constrained language keep rate exactly 1.0 and
    every other language downsample proportionally, i.e. the largest
    mixture achievable without upsampling. Membership is the md5
    hash-mod bucket (pure function of doc_id), so the sampled corpus
    is reproducible across engines, runs, and re-partitionings.

    Scale shape: one pass computes per-doc token counts (codegen'd,
    no Python); per-language totals are O(languages) rows; the rate
    table broadcasts back onto the doc stream — no shuffle of document
    content at all, exactly one wide aggregate over O(langs) groups.
    All rate arithmetic is double-precision with a fixed expression
    shape, so keep_bp is bit-identical in Spark and the DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        token_count_ws("text").alias("n_tok"),
        _bucket_bp("doc_id").alias("bucket_bp"),
    )
    share = None
    for lang, s in TARGET_MIX.items():
        share = (
            F.when(F.col("lang") == lang, F.lit(s))
            if share is None
            else share.when(F.col("lang") == lang, F.lit(s))
        )
    tot = (
        tok.groupBy("lang")
        .agg(F.sum("n_tok").alias("lang_tok"))
        .select("lang", "lang_tok", share.otherwise(F.lit(0.0)).alias("share"))
    )
    scale = tot.agg(
        F.min(F.col("lang_tok").cast("double") / F.col("share")).alias("scale")
    )
    rates = tot.crossJoin(F.broadcast(scale)).select(
        "lang",
        F.floor(
            F.col("share") * F.col("scale") / F.col("lang_tok").cast("double")
            * MIX_BP
        )
        .cast("long")
        .alias("keep_bp"),
    )
    return (
        tok.join(F.broadcast(rates), "lang")
        .where(F.col("bucket_bp") < F.col("keep_bp"))
        .select("doc_id", "lang", "n_tok", "bucket_bp", "keep_bp")
    )


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality proxy: per-document mean negative
    log-likelihood under the corpus's OWN unigram distribution —
    gibberish and boilerplate-heavy docs score high, fluent text low.
    The cheap stand-in for the KenLM perplexity filter every web-scale
    cleaning pipeline runs.

    Shape: one tokenize pass builds the (doc, token, tf) matrix
    (persisted — the freq branch and the score branch both read it, and
    Spark does not share subplans); token frequencies are one further
    aggregate OVER THE TF MATRIX (input already one row per (doc,
    token), not per token occurrence); the per-token -ln p table joins
    back by token. The join is left to AQE: at test scale the vocab
    broadcasts, at 100 TB a 1e8-row vocab becomes a shuffle join on
    token — both correct, neither moves document text.

    Determinism: -ln p is rounded to 6 decimals per TOKEN (the repo's
    ln convention, see q_tfidf) and routed through decimal for the
    per-doc sum, so the result is partition-order independent and
    bit-identical to the DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", nonempty_tokens("text").alias("toks"))
        .select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    freq = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    tot = freq.agg(F.sum("cnt").alias("total"))
    nlp = freq.crossJoin(F.broadcast(tot)).select(
        "token",
        F.round(
            -F.log(F.col("cnt").cast("double") / F.col("total").cast("double")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("nlp"),
    )
    return (
        tf.join(nlp, "token")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("tf") * F.col("nlp")).cast("double") / F.sum("tf")
            ).alias("mean_nll"),
            F.sum("tf").cast("long").alias("n_tok"),
        )
    )


# Jelinek–Mercer interpolation weights: bigram term and unigram
# backoff (which absorbs transitions unseen as bigrams — every token
# the corpus contains has a nonzero unigram probability, so p > 0
# always). BOTH are explicit literals, not 1−λ: Python's 1.0 − 0.7 is
# 0.30000000000000004 while a SQL `0.3` literal is the nearest double
# BELOW 0.3 — the cross-engine hash convention needs bit-equal
# constants.
BIGRAM_LAMBDA = 0.7
BIGRAM_BACKOFF = 0.3


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram LM quality proxy — one step up the KenLM
    ladder from q_unigram_logprob: per-document mean negative
    log-likelihood of its token TRANSITIONS under the corpus's own
    Jelinek–Mercer-smoothed bigram model,
    p(w2|w1) = λ·c(w1 w2)/c(w1·) + (1−λ)·c(w2)/total, λ = 0.7.
    Repetitive/templated docs (predictable transitions) score LOW,
    token-salad docs score HIGH even when their unigrams look fluent —
    the dimension the unigram proxy cannot see.

    Shape: one tokenize pass builds the per-doc transition tf matrix
    via zip_with over two shifted token-array slices (the bigram_freq
    move — adjacent pairs inside the row, no positional shuffle);
    c(w1 w2) and the context total c(w1·) are aggregates OVER that
    matrix (so p2 sums to 1 per context by construction); the unigram
    backoff reuses the full-corpus token distribution. All joins key
    on tokens/bigrams — AQE broadcasts the vocab tables at test scale,
    shuffles them at 1e8-row vocab scale; document text never
    re-shuffles. Determinism: -ln p rounded to 6 decimals per
    TRANSITION and decimal-routed for the per-doc sum (the
    unigram_logprob convention), partition-order independent."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", nonempty_tokens("text").alias("toks")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # ^ read by the transition matrix AND the unigram backoff counts.
    bg = F.zip_with(
        F.slice("toks", 1, F.size("toks") - 1),
        F.slice("toks", 2, F.size("toks") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    tf = (
        toks.where(F.size("toks") >= 2)
        .select("doc_id", F.explode(bg).alias("b"))
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # ^ the model tables below are aggregates of this matrix; persisting
    # it keeps the tokenize/explode pass single-execution.
    big = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    ctx = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    uni = (
        toks.select(F.explode("toks").alias("w2"))
        .groupBy("w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    tot = uni.agg(F.sum("c2").alias("total"))
    p = F.lit(BIGRAM_LAMBDA) * (
        F.col("c12").cast("double") / F.col("c1").cast("double")
    ) + F.lit(BIGRAM_BACKOFF) * (
        F.col("c2").cast("double") / F.col("total").cast("double")
    )
    nll = (
        big.join(ctx, "w1")
        .join(uni, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.round(-F.log(p), 6).cast("decimal(18,6)").alias("nll"),
        )
    )
    return (
        tf.join(nll, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("tf") * F.col("nll")).cast("double") / F.sum("tf")
            ).alias("mean_nll_bigram"),
            F.sum("tf").cast("long").alias("n_transitions"),
        )
    )


# Kneser–Ney absolute discount. An exactly-representable double
# (0.75 = 3/2^2), written as the SAME literal on both engines (the
# BIGRAM_LAMBDA convention — never derive it as 1 − x).
KN_DISCOUNT = 0.75


def q_trigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney TRIGRAM LM quality proxy — the next
    KenLM rung above q_bigram_logprob (VERDICT r11 ask #5): real
    curation pipelines filter on ≥trigram perplexity; the KN
    continuation counts are what make low-order backoff estimate "how
    many contexts does this word complete" instead of raw frequency
    (Kneser & Ney 1995; Chen & Goodman 1999 — public literature).

    Model (exact interpolated KN, discount D = 0.75):
      p(w3|w1 w2) = max(c123 − D, 0)/c12 + (D·t12/c12) · p(w3|w2)
      p(w3|w2)    = max(n23 − D, 0)/n2·  + (D·t2/n2·)  · p_cont(w3)
      p_cont(w3)  = n·3 / n··
    where EVERY statistic derives from the corpus's trigram TYPE
    inventory: c123 = trigram count, c12/t12 = token/type totals of
    the (w1,w2) context, n23 = |{w1: c123>0}| (continuation count of
    the bigram), n2· = Σ_w3 n23, t2 = |{w3: n23>0}|, n·3 = |{w2:
    n23>0}|, n·· = total distinct (w2,w3) types. Deriving the middle
    level from trigram types (not raw bigram counts) is exactly the
    KN construction, and it makes each level self-normalizing: with
    all counts ≥ 1 > D, Σ_w3 p = 1 per context.

    Scored over the corpus's own transitions, every scored trigram
    has c123 ≥ 1, so no unseen-event branch exists — the whole model
    is count tables joined back onto the type inventory.

    Shape: ONE tokenize pass builds the per-doc trigram tf matrix via
    two chained zip_with's over three shifted token-array slices (the
    bigram_logprob move — adjacent triples inside the row, no
    positional shuffle); the five model tables are aggregates OVER
    that matrix; joins key on token tuples, so AQE broadcasts them at
    test scale and shuffles at 1e8-row vocab scale. Document text
    never re-shuffles. Determinism: counts are exact integers, the
    probability is a fixed-order IEEE-double expression with literal
    D on both engines, -ln rounded to 6 decimals per TYPE and
    decimal-routed for the per-doc sum (the unigram/bigram
    convention) — partition-order independent, bit-identical to the
    DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", nonempty_tokens("text").alias("toks"))
    n2 = F.size("toks") - 2
    pair = F.zip_with(
        F.slice("toks", 1, n2),
        F.slice("toks", 2, n2),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    tg = F.zip_with(
        pair,
        F.slice("toks", 3, n2),
        lambda p, c: F.struct(
            p["w1"].alias("w1"), p["w2"].alias("w2"), c.alias("w3")
        ),
    )
    tf = scratch_persist(
        toks.where(F.size("toks") >= 3)
        .select("doc_id", F.explode(tg).alias("g"))
        .select(
            "doc_id",
            F.col("g.w1").alias("w1"),
            F.col("g.w2").alias("w2"),
            F.col("g.w3").alias("w3"),
        )
        .groupBy("doc_id", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # ^ the model tables below are aggregates of this matrix (and the
    # final join reads it again): persist keeps the tokenize/explode
    # pass single-execution; evictable via session.evict_scratch.
    tri = tf.groupBy("w1", "w2", "w3").agg(F.sum("tf").alias("c123"))
    tri = scratch_persist(tri)  # ctx12 + mid + the nll join read it
    ctx12 = tri.groupBy("w1", "w2").agg(
        F.sum("c123").alias("c12"), F.count(F.lit(1)).alias("t12")
    )
    # one row per trigram TYPE ⇒ COUNT(*) per (w2,w3) = |{w1}| = the
    # KN continuation count of the bigram
    mid = tri.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("n23"))
    mid = scratch_persist(mid)  # ctx2 + cont + tt + the nll join
    ctx2 = mid.groupBy("w2").agg(
        F.sum("n23").alias("n2tot"), F.count(F.lit(1)).alias("t2")
    )
    cont = mid.groupBy("w3").agg(F.count(F.lit(1)).alias("n_3"))
    tt = mid.agg(F.count(F.lit(1)).alias("ntt"))

    D = F.lit(KN_DISCOUNT)
    p_cont = F.col("n_3").cast("double") / F.col("ntt").cast("double")
    p_mid = F.greatest(
        F.col("n23").cast("double") - D, F.lit(0.0)
    ) / F.col("n2tot").cast("double") + (
        D * F.col("t2").cast("double") / F.col("n2tot").cast("double")
    ) * p_cont
    p_tri = F.greatest(
        F.col("c123").cast("double") - D, F.lit(0.0)
    ) / F.col("c12").cast("double") + (
        D * F.col("t12").cast("double") / F.col("c12").cast("double")
    ) * p_mid
    nll = (
        tri.join(ctx12, ["w1", "w2"])
        .join(mid, ["w2", "w3"])
        .join(ctx2, "w2")
        .join(cont, "w3")
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            "w3",
            F.round(-F.log(p_tri), 6).cast("decimal(18,6)").alias("nll"),
        )
    )
    return (
        tf.join(nll, ["w1", "w2", "w3"])
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("tf") * F.col("nll")).cast("double") / F.sum("tf")
            ).alias("mean_nll_trigram"),
            F.sum("tf").cast("long").alias("n_transitions"),
        )
    )


# Perplexity-gate keep fraction: keep the lowest 4/5 of scored docs by
# mean trigram NLL — exact integer arithmetic (5·rank ≤ 4·n), no
# float threshold to drift cross-engine.
PPL_KEEP_NUM = 4
PPL_KEEP_DEN = 5


def q_perplexity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-perplexity curation gate — the operation q_trigram_logprob
    exists to feed (the CCNet/Gopher-style "drop the worst-perplexity
    tail" rule, public literature): score every doc with the exact
    interpolated-KN trigram mean NLL, rank ascending (best first,
    doc_id tiebreak), KEEP the lowest PPL_KEEP_NUM/PPL_KEEP_DEN
    fraction — an EXACT count threshold (5·rank ≤ 4·n), not a float
    quantile, so the cut is bit-deterministic cross-engine.

    Shape: the per-doc score table is corpus-sized, so the global
    rank uses the range-exchange kernel (q_global_rank,
    relational.py:437 — range-repartition on (score, doc_id), local
    row_number, broadcast per-partition offsets), never an
    unpartitioned window; n arrives as the allowlisted 1-row
    broadcast. Ranking on doubles is safe here because the engine's
    NLL convention makes every mean_nll_trigram bit-identical in
    Spark and DuckDB (same fixed-order IEEE expression, 6-decimal
    per-type rounding, decimal-routed sums).

    Output: (doc_id, mean_nll_trigram, n_transitions, nll_rank,
    kept) for every scored doc (≥ 3 tokens)."""
    from ..session import default_parallelism

    scored = scratch_persist(q_trigram_logprob(spark, sf_dir))
    # ^ read by the range exchange AND (via offsets/total) twice more
    ranged = scored.repartitionByRange(
        default_parallelism(), "mean_nll_trigram", "doc_id"
    ).withColumn("pid", F.spark_partition_id())
    local = scratch_persist(
        ranged.withColumn(
            "lr",
            F.row_number().over(
                Window.partitionBy("pid").orderBy(
                    "mean_nll_trigram", "doc_id"
                )
            ),
        )
    )
    # ^ persisted BEFORE branching: offsets + the final join must see
    # the SAME sampled range boundaries (the q_global_rank rule)
    offsets = (
        local.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("pid", "off")
    )
    tot = local.agg(F.count(F.lit(1)).alias("n_scored"))
    return (
        local.join(F.broadcast(offsets), "pid")
        .crossJoin(F.broadcast(tot))  # 1-row scored-doc total
        .select(
            "doc_id",
            "mean_nll_trigram",
            "n_transitions",
            (F.col("lr") + F.col("off")).cast("long").alias("nll_rank"),
            (
                (F.col("lr") + F.col("off")) * F.lit(PPL_KEEP_DEN)
                <= F.col("n_scored") * F.lit(PPL_KEEP_NUM)
            ).alias("kept"),
        )
    )


# --- BM25 relevance (round 5) -------------------------------------------

# Parameters are defined next to the oracle (single source of truth,
# the SOURCE_CAP pattern). The driver fixture vocabulary contains all
# three query terms at every scale factor.
from ..oracles import BM25_B, BM25_K1, BM25_TERMS, BM25_TOPK  # noqa: E402


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (Robertson–Spärck Jones probabilistic
    relevance, the default ranking function of every search engine)
    for a fixed query-term set over ``documents``.

    Spark-first shape — NO explode, NO per-token shuffle: per-term
    term frequencies are within-row array expressions
    (``size(filter(toks, t))``), so the whole scoring pass is a
    map-only codegen'd scan. The only shuffle in the plan is the
    single-row corpus-statistics aggregate (N, avgdl, per-term df)
    that broadcasts back onto the scan; the final top-k is Spark's
    TakeOrderedAndProject (per-partition heap + driver merge of
    k·partitions rows — never a global sort). At 100 TB this is two
    linear scans of one projected column and a k-row result.

    Cross-engine determinism: tf/dl/df/N are exact integers, avgdl is
    one IEEE division, idf is one ``ln`` on identical doubles, and the
    3-term score sum is written in fixed order — so Spark and DuckDB
    produce bit-identical doubles, rounded to 6 decimals per the
    engine's libm convention (oracles.py).

    Reference parity: generalizes the reference's single static
    aggregation query (/root/reference/mapreduce.cc:200 word-count) to
    scored retrieval over the same tokenization.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Token array projected ONCE: referenced 4× below, so CollapseProject
    # keeps the split materialized instead of re-tokenizing per column
    # (the HOF-lambda CSE trap, token_shingles in dedup.py).
    toks = docs.select("doc_id", nonempty_tokens("text").alias("toks"))

    # NB: a two-parameter lambda would be treated by PySpark's HOFs as
    # (element, index) — capture the term via a closure factory instead.
    def tf_of(term: str) -> Column:
        return F.size(F.filter("toks", lambda x: x == F.lit(term))).cast(
            "long"
        )

    base = toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("dl"),
        *[tf_of(t).alias(f"tf_{t}") for t in BM25_TERMS],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )

    def term_score(t: str) -> Column:
        idf = F.log(
            (
                (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
                / (F.col(f"df_{t}") + F.lit(0.5))
            )
            + F.lit(1.0)
        )
        tf = F.col(f"tf_{t}").cast("double")
        norm = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
        )
        return idf * tf * F.lit(BM25_K1 + 1.0) / norm

    score = term_score(BM25_TERMS[0])
    for t in BM25_TERMS[1:]:
        score = score + term_score(t)
    scored = base.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "dl",
        *[f"tf_{t}" for t in BM25_TERMS],
        (F.round(score, 6) + 0.0).alias("score"),
    )
    return (
        scored.where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


# Reciprocal-rank-fusion constants shared with the DuckDB twin
# (Cormack, Clarke, Büttcher 2009, SIGIR: "Reciprocal rank fusion
# outperforms Condorcet..."): standard K=60 damping; pools of
# BM25_TOPK=50 per system; 10 fused.
from ..oracles import RRF_K, RRF_OUT  # noqa: E402


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID RETRIEVAL by reciprocal rank fusion — the standard way a
    RAG / training-data-curation stack combines lexical and vector
    search without score calibration: fuse the BM25 top-50 pool
    (q_bm25_topk's exact scoring pass over ``documents``) with the
    cosine top-50 pool (q_topk_similarity's exact scan over
    ``embeddings``; vec_id ≡ doc_id for the embedded subset) as
    rrf(d) = Σ_systems 1/(K + rank_d), K=60, missing → 0 — rank-based,
    so the two systems' incomparable score scales never meet.

    Cross-engine determinism: both pool rankings reuse conventions
    already hash-proven by their standalone rows (BM25 ranks on the
    round-6 score with doc_id tie-break; cosine ranks on the exact
    double with vec_id tie-break), and the fusion arithmetic is two
    IEEE divisions by exact integers summed in fixed order
    (lexical + vector), rounded to 6.

    Plan: each pool is its component's plan (map-only scan + 1-row
    stats broadcast + TakeOrderedAndProject); the rank windows run
    over the ≤50-row pools (O(k), never data-sized); the fusion is a
    full-outer join of two ≤50-row frames. At 100 TB the cost is the
    two component scans — fusion is free."""
    from .similarity import QUERY_VEC_ID, _as_double, cosine

    lex_pool = q_bm25_topk(spark, sf_dir).select("doc_id", "score")
    lex = lex_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .cast("long")
        .alias("lex_rank"),
    )

    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(
        _as_double("embedding").alias("qvec")
    )
    # Pool and rank order on the ROUND-4 similarity (the convention
    # topk_similarity's hash row already proves bit-identical across
    # engines) with the vec_id tie-break: ranking on the unrounded
    # double would let a 1-ulp difference between Spark's fold order
    # and DuckDB's list_cosine_similarity flip a near-tie rank.
    vec_pool = (
        emb.where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            (
                F.round(cosine(_as_double("embedding"), F.col("qvec")), 4)
                + 0.0
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(BM25_TOPK)
    )
    vec = vec_pool.select(
        "vec_id",
        F.row_number()
        .over(Window.orderBy(F.col("sim").desc(), "vec_id"))
        .cast("long")
        .alias("vec_rank"),
    )

    fused = lex.join(vec, lex.doc_id == vec.vec_id, "full_outer").select(
        F.coalesce("doc_id", "vec_id").alias("doc_id"),
        "lex_rank",
        "vec_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("vec_rank")), F.lit(0.0)
            )
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.col("rrf").desc(), "doc_id")
        .limit(RRF_OUT)
        .select(
            "doc_id",
            "lex_rank",
            "vec_rank",
            (F.round("rrf", 6) + 0.0).alias("rrf_score"),
        )
    )


# --- Source divergence (round 5, wave 6) ---------------------------------


def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source total-variation distance between the source's unigram
    distribution and the whole corpus's — the mixture-drift diagnostic
    a pretraining pipeline runs per crawl/source: a source whose token
    distribution diverges hard from the corpus is boilerplate, spam,
    or another language, and feeds the same dashboards as
    q_curation_report.

    TV is chosen over KL deliberately: TV = ½ Σ_t |p_t − q_t| is pure
    rational arithmetic, so with p_t = c_st/N_s and q_t = c_t/N the
    numerator Σ_t |c_st·N − c_t·N_s| is EXACT integer math — no logs,
    no rounding convention, bit-identical across engines (KL would
    need the tfidf ln-round-6 convention). Tokens absent from the
    source are folded in without an outer join via
    Σ_{t∉s} c_t·N_s = (N − M_s)·N_s where M_s = Σ_{t∈s} c_t, so the
    only joins are the source×token → corpus-count equi-join (shuffle
    keys are tokens) and a 40-row broadcast of per-source totals. All
    magnitudes stay ≤ 2·N_s·N < 2^53 through sf1, so the final double
    division is exact-operand IEEE and engine-independent.

    At 100 TB: two token-keyed aggregations plus one token-keyed join —
    the same shuffle shape as wordcount; per-source constants ride a
    broadcast. No data-sized window, no cross join wider than the
    1-row corpus total."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(nonempty_tokens("text")).alias("token")
    )
    # Referenced by three downstream branches (join left side, corpus
    # rollup, per-source totals) — persist so the tokenize+count pass
    # runs once, the same materialize-once move as dedup_ngram's
    # shingle table.
    src_tok = (
        toks.groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt_s"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    corpus_tok = src_tok.groupBy("token").agg(F.sum("cnt_s").alias("cnt_c"))
    src_tot = src_tok.groupBy("source").agg(F.sum("cnt_s").alias("n_s"))
    n_total = src_tot.agg(F.sum("n_s").alias("n_total"))
    consts = F.broadcast(src_tot.crossJoin(n_total))
    j = src_tok.join(corpus_tok, "token").join(consts, "source")
    per = j.groupBy("source").agg(
        F.first("n_s").alias("n_tokens"),
        F.first("n_total").alias("n_total"),
        F.sum(
            F.abs(
                F.col("cnt_s") * F.col("n_total")
                - F.col("cnt_c") * F.col("n_s")
            )
        ).alias("num_present"),
        F.sum("cnt_c").alias("m_s"),
    )
    return per.select(
        "source",
        "n_tokens",
        (
            (
                F.col("num_present")
                + (F.col("n_total") - F.col("m_s")) * F.col("n_tokens")
            ).cast("double")
            / (F.lit(2) * F.col("n_total") * F.col("n_tokens")).cast("double")
        ).alias("tv_divergence"),
    )


# --- Count-Min heavy hitters (round 5, wave 6) ---------------------------

# Width/depth: w = 8192 counters x d = 4 rows = 32k cells (256 KB of
# longs) regardless of vocabulary size. Estimate error is one-sided
# (over-count only), bounded by e/w x total-instances with prob
# 1 - e^-d per Cormode & Muthukrishnan 2005. Constants live in
# oracles.py (shared with the SQL twin; circular-import convention —
# see the BM25 import above).
from ..oracles import CMS_D, CMS_TOPK, CMS_W  # noqa: E402


def _cms_positions(col: Column, w: int = CMS_W, d: int = CMS_D) -> Column:
    """d seeded cell positions for a key — delegates to the shared
    seeded-hash helper (one hashing convention for Bloom and CMS)."""
    from .dedup import seeded_hash_positions

    return seeded_hash_positions(col, m=w, k=d)


def cms_topgram_frames(
    spark: SparkSession,
    sf_dir: str,
    w: int = CMS_W,
    d: int = CMS_D,
) -> tuple[DataFrame, DataFrame]:
    """(sketch cells, per-shingle estimates) for the corpus's word
    trigrams. Split out so tests can shrink ``w`` to force collisions
    and check the one-sided error bound against exact counts."""
    from .dedup import _doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    grams = (
        _doc_shingles(docs)
        .select(F.explode("shingles").alias("gram"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cells = (
        grams.select(
            F.posexplode(_cms_positions(F.col("gram"), w, d)).alias(
                "row", "pos"
            )
        )
        .groupBy("row", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_true"))
        .select(
            "gram",
            "_true",
            F.posexplode(_cms_positions(F.col("gram"), w, d)).alias(
                "row", "pos"
            ),
        )
    )
    est = (
        probes.join(F.broadcast(cells), ["row", "pos"])
        .groupBy("gram")
        .agg(F.min("cnt").alias("est"), F.first("_true").alias("_true"))
    )
    return cells, est


def q_cms_topgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K most frequent word trigrams by COUNT-MIN SKETCH estimate —
    the fixed-memory boilerplate detector: repeated n-grams (license
    headers, nav bars, template sentences) surface as heavy hitters
    without ever materializing exact per-gram counts.

    The sketch is built DataFrame-natively (the bloom-filter trick from
    q_ngram_novelty_bloom, generalized to counters): each gram
    increments d=4 seeded-hash cells out of w=8192 per row; the cell
    table is a groupBy over (row, pos) — ≤ 32k rows of state no matter
    how many distinct grams exist, i.e. a true sketch: partial
    aggregation map-side means each executor ships at most 32k cells
    per shuffle, where an exact gram count ships its full local
    vocabulary. That fixed-size, mergeable build pass is the asset at
    100 TB — persist it once, merge across batches, probe any candidate
    list for free; the probe side HERE enumerates the distinct grams
    only to rank them for the report (batch verification shape), which
    is a vocabulary-sized aggregation a production pipeline would
    replace with a candidate list or a streaming probe. Estimates =
    min over the d probed cells (classic CMS), via a 32k-row broadcast
    join. Estimation is one-sided
    (est ≥ true count always — min of over-counting cells), so the
    true top grams can never be displaced downward by sketch error;
    the bound is pinned in tests with a deliberately shrunken w.

    HASH-VERIFIED since r08: the seeded-hash convention moved from
    engine-private xxhash64 to the md5-prefix form, so the DuckDB
    oracle replays every cell increment, every min-probe, and the
    deterministic (est desc, gram) top-K tie-break bit-for-bit —
    "approximate" means approximate w.r.t. exact counts, not
    non-deterministic. Tests additionally pin est ≥ exact and the e/w
    error bound (tests/test_round5_wave6.py)."""
    _cells, est = cms_topgram_frames(spark, sf_dir)
    return (
        est.select("gram", "est")
        .orderBy(F.col("est").desc(), "gram")
        .limit(CMS_TOPK)
    )


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("PHRASE[0] PHRASE[1]") via a POSITIONAL
    inverted index — the retrieval primitive tfidf/bm25/inverted_index
    don't cover: postings carry token positions, and a phrase match is
    an equi-join of the two terms' postings on (doc_id, adjacent
    positions).

    The probe filters the posting stream to the two query terms BEFORE
    any shuffle — the selectivity an index lookup would give — so the
    join shuffles only matching postings on doc_id keys, never the
    corpus. At 100 TB the (token, doc_id, pos) index is the persisted,
    token-bucketed table this scans; term-filter pushdown onto its
    token column replaces the explode. n-word phrases chain n−1 of the
    same adjacency joins."""
    from ..oracles import PHRASE

    docs = load_table(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id", F.posexplode(nonempty_tokens("text")).alias("pos", "token")
    ).where(F.col("token").isin(*PHRASE))
    a = postings.where(F.col("token") == PHRASE[0]).select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    # explicit successor position on the left side: the join is a plain
    # two-key equi-join, no self-join column ambiguity
    b = postings.where(F.col("token") == PHRASE[1]).select(
        "doc_id", (F.col("pos") - 1).alias("pos_a")
    )
    return (
        a.join(b, ["doc_id", "pos_a"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


# --- cross-source shingle overlap (round 6 wave 9) -------------------------


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise n-gram overlap between corpus sources: for every
    source pair sharing ≥1 distinct 3-gram shingle, the shared/total
    set sizes and Jaccard similarity — the cross-source contamination
    / syndication matrix a curation pass reads before fixing mixture
    weights (two "different" sources with high Jaccard are mirrors).

    Scale shape: documents shingle once via the engine's two-step
    shingle projection (HOF CSE trap), collapse to DISTINCT
    (source, shingle) — the only content-keyed shuffle, and the unit
    of work is a shingle, never a document pair; the intersection
    self-join meets only within a shingle (fan bounded by
    #sources²/shingle, ≤190 here), and the per-source set sizes join
    back as a broadcast of #sources rows. Counts are BIGINT; jaccard
    is the rounded display column (round+0.0 convention)."""
    from .dedup import shingle_frame

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    ss = (
        shingle_frame(docs, 3, "source")
        .select("source", F.explode("shingles").alias("shingle"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )  # both sides of the intersection join + the size aggregate
    sizes = ss.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = ss.alias("a")
    b = ss.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.round(
                    F.col("n_shared")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                    6,
                )
                + 0.0
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


def q_seq_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram with cumulative coverage — the packing
    diagnostic run before choosing a sequence length for training
    shards: per 16-token bucket, document count, token mass, and the
    cumulative share of documents fully covered at that cutoff.

    Plan: the per-doc token count is map-only (size of the split — no
    n-gram work), the histogram is a partial-aggregating groupBy on
    ≤ (max_len/16) buckets, and the cumulative shares are windows over
    the bucket axis — O(buckets) rows after the first aggregate, so
    the window sort is on a handful of rows at any corpus size.
    Integer-exact counts; shares are single double divisions of exact
    longs.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Column has no floordiv; counts are non-negative so double-div +
    # long cast IS floor division. Tokenization is token_count_ws
    # (\s+ runs collapse) to match the oracle's regexp_split_to_array
    # convention on any whitespace, not just single spaces (ADVICE r07).
    lens = docs.select(token_count_ws("text").alias("n_tokens")).select(
        (F.col("n_tokens") / 16).cast("long").alias("bucket"), "n_tokens"
    )
    hist = lens.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    return hist.select(
        "bucket",
        ((F.col("bucket") + 1) * 16).alias("cutoff_tokens"),
        "n_docs",
        "sum_tokens",
        (
            F.sum("n_docs").over(w).cast("double")
            / F.sum("n_docs").over(tot).cast("double")
        ).alias("cum_doc_share"),
        (
            F.sum("sum_tokens").over(w).cast("double")
            / F.sum("sum_tokens").over(tot).cast("double")
        ).alias("cum_token_share"),
    )


def q_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EXACT-RATIO train/val/test split (80/10/10)
    stratified by (lang, source) — the dataset-split assignment every
    training pipeline materializes. Docs are ranked within their
    stratum by the md5 of their key (a reproducible shuffle — stable
    across runs, engines, partitionings), then cut at exact 80%/90%
    boundaries of the stratum size, so every stratum's ratio is exact
    to ±1 doc (hash-mod splits like q_deterministic_sample only get
    ratios in expectation).

    Plan: one stratum-hash exchange carrying row_number + count
    windows (same partitioning, one sort), then a map-side split
    assignment — linear at any corpus size; the output here aggregates
    to per-(stratum, split) counts so the driver row stays O(strata).
    Integer-exact boundaries: r ≤ 8n/10 and r ≤ 9n/10 compare
    integers (no double ratios anywhere).
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang", "source").orderBy(key, "doc_id")
    ranked = docs.select(
        "lang",
        "source",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("lang", "source"))
        .alias("n"),
    )
    split = (
        F.when(F.col("r") * 10 <= F.col("n") * 8, F.lit("train"))
        .when(F.col("r") * 10 <= F.col("n") * 9, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        ranked.select("lang", "source", split.alias("split"))
        .groupBy("lang", "source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


from ..oracles import NEG_K, NEG_STEP  # noqa: E402 — canonical home


def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic in-batch negative sampling for contrastive
    training: for every anchor document, NEG_K negatives drawn from
    the SAME language (hard-ish negatives) at reproducible positions —
    negative i sits at (rank + i·NEG_STEP) mod n on the language's
    md5-ranked ring, so the sample is a pure function of the corpus
    (stable across runs/engines/partitionings, auditable, and
    collision-free with the anchor for n > NEG_K·NEG_STEP…n not a
    divisor case handled by the mod).

    Plan: one lang-hash exchange for the ranking windows, then an
    equi-join of (lang, target_rank) against (lang, rank) — a
    shuffle-hash join on composite keys, never a cross join; output is
    NEG_K rows per anchor. At 100 TB the ring join is the same
    key-partitioned shape as any fact⋈fact join.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(key, "doc_id")
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    offsets = F.explode(
        F.array(*[F.lit(i) for i in range(1, NEG_K + 1)])
    ).alias("i")
    probes = ranked.select(
        F.col("doc_id").alias("anchor_id"),
        "lang",
        "r",
        "n",
        offsets,
    ).select(
        "anchor_id",
        "lang",
        "i",
        # 1-based ring arithmetic: ((r − 1 + i·STEP) mod n) + 1
        (
            (F.col("r") - 1 + F.col("i") * NEG_STEP) % F.col("n") + 1
        ).alias("tr"),
    )
    ring = ranked.select(
        F.col("lang").alias("lang2"),
        F.col("r").alias("r2"),
        F.col("doc_id").alias("neg_id"),
    )
    return (
        probes.join(
            ring,
            (F.col("lang") == F.col("lang2")) & (F.col("tr") == F.col("r2")),
        )
        .where(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", "i", "neg_id")
    )


def q_decay_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exponentially TIME-DECAYED count and value mass
    (half-life = 1 day against the corpus's newest day) — the
    freshness weighting a feed/training pipeline applies so yesterday
    counts half of today.

    Floating-point 0.5^age sums are accumulation-order-dependent; this
    plan keeps decay EXACT: the weight for age d days is the dyadic
    integer 2^(30−d) (the event span is bounded by the 31-day fixture
    window; ages clamp at 30 ⇒ weight ≥ 1), so the decayed count is an
    exact integer sum divided once by 2^30, and the decayed value mass
    routes vi·2^(30−d) through DECIMAL(38,0). One 1-row max-day
    broadcast (bounded scalar, the rolling_active_users pattern) + one
    partial-aggregating scan.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        (F.col("value").cast("decimal(18,4)") * 10000)
        .cast("long")
        .alias("vi"),
    )
    mx = ev.groupBy().agg(F.max("day").alias("max_day"))
    aged = ev.crossJoin(F.broadcast(mx)).select(
        "event_type",
        "vi",
        F.least(F.datediff("max_day", "day"), F.lit(30)).alias("age"),
    )
    weight = F.shiftleft(F.lit(1).cast("long"), 30) / F.pow(
        F.lit(2.0), F.col("age")
    )
    # 2^(30-age) as an exact integer: shiftleft needs a literal count,
    # so compute via the exact double pow (2^age ≤ 2^30 is exact) and
    # cast — every intermediate is an integer-valued double ≤ 2^30
    wcol = weight.cast("long")
    agg = aged.select(
        "event_type",
        wcol.alias("w"),
        (F.col("vi").cast("decimal(20,0)") * wcol.cast("decimal(20,0)"))
        .cast("decimal(38,0)")
        .alias("wv"),
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("w").alias("wsum"),
        F.sum("wv").alias("wvsum"),
    )
    return agg.select(
        "event_type",
        "n_events",
        (F.col("wsum").cast("double") / F.lit(float(1 << 30))).alias(
            "decayed_count"
        ),
        (
            F.col("wvsum").cast("double")
            / (F.lit(float(1 << 30)) * F.lit(10000.0))
        ).alias("decayed_value"),
    )


# --- fastText-style quality classifier (r13) ------------------------------

# Hashed feature space: unigrams + bigrams share one D-bucket table
# (fastText's hashing trick). 4096 buckets is deliberately small — the
# model is a BROADCASTABLE weight table at any corpus scale, which is
# the entire point of the fastText family for web-scale curation.
QC_BUCKETS = 4096
# Doc-statistic features appended ABOVE the hashed space: one length-
# decile indicator per doc (feat = QC_BUCKETS + min(n_tok // 10, 10)).
# A bag-of-grams linear model is blind to absolute length, and the
# distilled label's boundary is nonlinear in (length, stopword-count)
# space (cnt ≥ 0.75·N − 0.01·N², a parabola) — the indicators let the
# linear model fit it piecewise, the standard doc-stat-feature trick
# beside hashed n-grams. Measured: held-out accuracy 0.54→0.73
# (sf0.01) / 0.72→0.86 (sf0.001) vs 0.65/0.63 majority baselines.
QC_LEN_BUCKETS = 11
QC_DIM = QC_BUCKETS + QC_LEN_BUCKETS
# Labeled slice: deterministic md5-bucket < 50% of docs (same hash-mod
# membership as q_deterministic_sample / the decontaminate eval split),
# so the "human-labeled" training set is reproducible across engines.
QC_TRAIN_PCT = 50


def _qc_bucket(col: Column | str = "doc_id") -> Column:
    """Deterministic 0-99 labeled-slice bucket (md5-prefix mod 100)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 6), 16, 10).cast(
            "bigint"
        )
        % 100
    )


def _qc_feat(gram: Column) -> Column:
    """Feature id: md5-prefix 60-bit integer mod QC_BUCKETS — the
    engine's cross-engine string-hash convention (dedup_minhash's hs
    chain), so DuckDB derives the identical bucket ids."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("bigint")
        % QC_BUCKETS
    )


def qc_feature_tf(docs: DataFrame) -> DataFrame:
    """(doc_id, feat, tf) hashed-feature term-frequency matrix:
    unigrams + adjacent bigrams ("w1 w2"), both hashed into the shared
    QC_BUCKETS space, plus one length-decile indicator per doc in the
    QC_LEN_BUCKETS slots above it (see the QC_LEN_BUCKETS rationale).
    Bigrams come from zip_with over two shifted token-array slices
    (the bigram_logprob move — adjacent pairs inside the row, no
    positional shuffle)."""
    toks = docs.select("doc_id", nonempty_tokens("text").alias("toks"))
    bg = F.zip_with(
        F.slice("toks", 1, F.size("toks") - 1),
        F.slice("toks", 2, F.size("toks") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    grams = toks.select(
        "doc_id",
        F.concat(
            F.col("toks"),
            F.when(F.size("toks") >= 2, bg).otherwise(
                F.array().cast("array<string>")
            ),
        ).alias("grams"),
    )
    gram_tf = (
        grams.select("doc_id", F.explode("grams").alias("gram"))
        .select("doc_id", _qc_feat(F.col("gram")).alias("feat"))
        .groupBy("doc_id", "feat")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    len_tf = toks.where(F.size("toks") > 0).select(
        "doc_id",
        (
            F.lit(QC_BUCKETS)
            + F.least(
                F.floor(F.size("toks") / 10).cast("bigint"),
                F.lit(QC_LEN_BUCKETS - 1),
            )
        ).alias("feat"),
        F.lit(1).cast("long").alias("tf"),
    )
    return gram_tf.unionAll(len_tf)


# Distilled label: positive = the engine's own composite heuristic
# (quality_score_cols) at or above this cut — the "expensive labeler"
# a production pipeline distills into a cheap hashed linear model.
# 0.5 splits the synthetic fixture ~37/63.
QC_LABEL_CUT = 0.5


def qc_fit(spark: SparkSession, docs: DataFrame) -> dict:
    """Fit the hashed-n-gram NB quality model over ``docs`` and
    return its tables: {'tf', 'lab', 'w', 'prior', 'scored',
    'thr'} — shared by the batch classifier, the report, and the
    streaming ingest gate (which takes w as a static join table
    and bias/thr as bounded 1-row collects). See
    q_quality_classifier for semantics and determinism notes."""
    tf = scratch_persist(qc_feature_tf(docs))
    qcols = quality_score_cols("text")
    lab = scratch_persist(
        docs.select(
            "doc_id",
            (_qc_bucket() < QC_TRAIN_PCT).alias("is_train"),
            (qcols["quality_score"] >= F.lit(QC_LABEL_CUT)).alias(
                "label_hi"
            ),
        )
    )
    # ^ three consumers (class counts, prior, the scored join): the
    # persist is 3 ints/doc and saves two full text-column re-scans —
    # at corpus scale the dominant redundant IO.
    train_tf = tf.join(
        lab.where("is_train").select("doc_id", "label_hi"), "doc_id"
    )
    cls = train_tf.groupBy("feat").agg(
        F.sum(F.when(F.col("label_hi"), F.col("tf")).otherwise(0)).alias(
            "c_pos"
        ),
        F.sum(F.when(~F.col("label_hi"), F.col("tf")).otherwise(0)).alias(
            "c_neg"
        ),
    )
    tot = cls.agg(
        F.sum("c_pos").alias("t_pos"), F.sum("c_neg").alias("t_neg")
    )
    lnd = lambda x: F.round(F.log(x), 6).cast("decimal(18,6)")  # noqa: E731
    w = cls.crossJoin(F.broadcast(tot)).select(
        "feat",
        (
            lnd(
                (F.col("c_pos") + 1).cast("double")
                / (F.col("t_pos") + QC_DIM).cast("double")
            )
            - lnd(
                (F.col("c_neg") + 1).cast("double")
                / (F.col("t_neg") + QC_DIM).cast("double")
            )
        ).alias("w"),
    )
    prior = (
        lab.where("is_train")
        .agg(
            F.sum(F.when(F.col("label_hi"), 1).otherwise(0)).alias("n_pos"),
            F.sum(F.when(~F.col("label_hi"), 1).otherwise(0)).alias("n_neg"),
        )
        .select(
            (
                lnd(F.col("n_pos").cast("double"))
                - lnd(F.col("n_neg").cast("double"))
            ).alias("bias")
        )
    )
    # LEFT join: a feature never seen in the labeled slice has no
    # learned weight and scores 0 (fastText's absent-row convention —
    # the hashed model table only holds trained buckets).
    scored = scratch_persist(
        tf.join(w, "feat", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(
                (
                    F.col("tf").cast("decimal(18,0)")
                    * F.coalesce(
                        F.col("w"), F.lit(0).cast("decimal(18,6)")
                    )
                ).cast("decimal(38,6)")
            ).alias("wsum"),
            F.count(F.lit(1)).alias("n_feat"),
        )
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            "n_feat",
            (F.col("wsum") + F.col("bias"))
            .cast("decimal(38,6)")
            .alias("score_d"),
        )
        .join(lab, "doc_id")
    )
    # ^ read twice: once to calibrate the threshold on the labeled
    # slice, once to emit every document's verdict.
    thr = (
        scored.where("is_train")
        .agg(
            F.sum(F.when(F.col("label_hi"), F.col("score_d"))).alias("sp"),
            F.count(F.when(F.col("label_hi"), 1)).alias("np"),
            F.sum(F.when(~F.col("label_hi"), F.col("score_d"))).alias("sn"),
            F.count(F.when(~F.col("label_hi"), 1)).alias("nn"),
        )
        .select(
            (
                (
                    F.col("sp").cast("double") / F.col("np")
                    + F.col("sn").cast("double") / F.col("nn")
                )
                / 2
            ).alias("thr")
        )
    )
    return {
        "tf": tf,
        "lab": lab,
        "w": w,
        "prior": prior,
        "scored": scored,
        "thr": thr,
    }


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality classifier (Joulin et al. 2016,
    "Bag of Tricks for Efficient Text Classification") — the learned
    curation rung above q_perplexity_gate, the GPT-3/LLaMA-pipeline
    pattern: take a labeled reference slice, fit a cheap linear model
    over hashed n-gram features, score EVERY crawl document. Here the
    label is DISTILLED from the engine's own hash-verified composite
    heuristic (quality_score ≥ QC_LABEL_CUT — the classic
    expensive-labeler→cheap-model setup), the labeled slice is the
    deterministic md5-bucket < QC_TRAIN_PCT % of docs (the
    stratified_split convention), and the weights are the closed-form
    multinomial-naive-Bayes log-count ratios (add-1/Laplace) — the
    canonical linear baseline the fastText paper benchmarks against,
    chosen over an SGD fit because it admits a closed form every
    engine reproduces bit-for-bit. The decision threshold is
    CALIBRATED on the labeled slice (midpoint of the class-conditional
    mean scores) rather than fixed at 0 — multinomial NB scores carry
    a document-length offset (ln((t_neg+D)/(t_pos+D)) per gram), so
    raw-0 thresholding conflates length with quality; the calibrated
    cut reaches ~0.98 train / ~0.72 held-out accuracy on the
    token-salad fixture (vs 0.70 ranking AUC — measured, see
    tests/test_round13_ops.py).

    Shape: ONE tokenize pass builds the (doc_id, feat, tf) hashed
    matrix (persisted — the class-count branch and the scoring branch
    both read it); per-class feature totals are aggregates over the
    train-slice rows of that matrix; the weight table is ≤QC_BUCKETS
    rows JOINED BACK BY feat — AQE broadcasts it at any scale (a
    fixed-size model is map-side scoring at 100 TB; document text
    never shuffles, and the only data-sized shuffle is the (doc_id,
    feat, tf) int matrix). The prior, class totals, and calibrated
    threshold are 1-row broadcasts. Determinism: each ln term is
    rounded to 6 decimals and decimal(18,6)-routed (the
    unigram_logprob convention), tf × weight sums and the
    class-mean sums run in decimal, so every score — and the
    threshold — is partition-order independent and bit-identical to
    the DuckDB oracle.

    Output: one row per document with ≥1 token — (doc_id, is_train,
    label_hi, n_feat, score = NB log-odds, pred_hi = score > the
    calibrated threshold, correct = pred_hi == label_hi)."""
    docs = load_table(spark, sf_dir, "documents")
    m = qc_fit(spark, docs)
    scored, thr = m["scored"], m["thr"]
    score = F.col("score_d").cast("double")
    pred = score > F.col("thr")
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "is_train",
        "label_hi",
        "n_feat",
        score.alias("score"),
        pred.alias("pred_hi"),
        (pred == F.col("label_hi")).alias("correct"),
    )


def q_quality_classifier_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classifier-quality report over q_quality_classifier's decision
    table — the ann_recall_report pattern applied to the learned
    curation model: the family's quality claim (train fit vs held-out
    generalization) as a DRIVER-VERIFIED artifact instead of a pytest
    assertion. One row per split (train / heldout) with the full
    confusion-matrix counts and the derived rates.

    Shape: the classifier pipeline runs once (its tf/lab/scored
    persists are shared); the report is a 2-group aggregate over the
    per-doc decision table — integer counts plus exact IEEE divisions
    of those counts, so the row hashes cross-engine with no new
    conventions. At corpus scale this is a map-side count-aggregate
    over the already-computed decisions: free relative to the model
    pass itself."""
    scored = q_quality_classifier(spark, sf_dir)
    tp = F.when(F.col("pred_hi") & F.col("label_hi"), 1).otherwise(0)
    fp = F.when(F.col("pred_hi") & ~F.col("label_hi"), 1).otherwise(0)
    fn = F.when(~F.col("pred_hi") & F.col("label_hi"), 1).otherwise(0)
    tn = F.when(~F.col("pred_hi") & ~F.col("label_hi"), 1).otherwise(0)
    agg = scored.groupBy(
        F.when(F.col("is_train"), F.lit("train"))
        .otherwise(F.lit("heldout"))
        .alias("split")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("label_hi").cast("long")).alias("n_label_hi"),
        F.sum(F.col("pred_hi").cast("long")).alias("n_pred_hi"),
        F.sum(tp).cast("long").alias("tp"),
        F.sum(fp).cast("long").alias("fp"),
        F.sum(fn).cast("long").alias("fn"),
        F.sum(tn).cast("long").alias("tn"),
    )
    return agg.select(
        "split",
        "n_docs",
        "n_label_hi",
        "n_pred_hi",
        "tp",
        "fp",
        "fn",
        "tn",
        (
            (F.col("tp") + F.col("tn")).cast("double")
            / F.col("n_docs").cast("double")
        ).alias("accuracy"),
        F.when(
            F.col("n_pred_hi") > 0,
            F.col("tp").cast("double") / F.col("n_pred_hi").cast("double"),
        ).alias("precision"),
        F.when(
            F.col("n_label_hi") > 0,
            F.col("tp").cast("double") / F.col("n_label_hi").cast("double"),
        ).alias("recall"),
    )
