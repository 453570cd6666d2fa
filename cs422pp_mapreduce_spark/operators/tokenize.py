"""Tokenizer-aware token counting (real BPE) over ``documents``.

textops.q_token_count counts whitespace tokens and a BPE-ish regex
approximation — both pure JVM expressions, right for oracle-checked
stats. A pretraining pipeline, though, budgets and packs by *tokenizer*
tokens; this module runs the engine's pure-Python BPE
(functions/bpe.py) inside Arrow-batched ``mapInPandas`` — the declared
slow-path pattern (same shape as multimodal.py's decode kernels):
batch-columnar transfer, per-executor encoder with an LRU word cache,
never a per-row Python UDF.

Scale posture: the encode is embarrassingly parallel per document; the
explicit repartition buys full-core parallelism when the input layout
is coarser than compute wants (one cheap shuffle of raw text), and no
stage here shuffles anything wider than (doc_id, counts).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..session import default_parallelism
from ..sources.catalog import load_table

BPE_COUNT_SCHEMA = "doc_id long, n_ws_tokens long, n_bpe_tokens long"


def _count_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # import inside the worker so the encoder (and its merge table)
    # is constructed once per executor process, not shipped per task.
    # get_token_counter is the native-tokenizer slot: with
    # SPARK_GRAFT_NATIVE_BPE=1 (+ the `tokenizers` wheel) the SAME
    # kernel runs a Rust byte-level BPE — only this callable changes,
    # the Spark plan/schema/batching stay identical (functions/bpe.py).
    from ..functions.bpe import get_token_counter

    count = get_token_counter()
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_ws_tokens": pdf["text"]
                .str.split()
                .str.len()
                .astype("int64"),
                "n_bpe_tokens": pdf["text"].map(count).astype("int64"),
            }
        )


def add_bpe_token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens) for any (doc_id, text) frame
    — the alternate-column feed for seq_pack / mixture_rebalance when
    budgeting by tokenizer tokens instead of whitespace words."""
    return docs.select("doc_id", "text").mapInPandas(
        _count_batches, BPE_COUNT_SCHEMA
    )


CHUNK_BPE_SCHEMA = "doc_id long, chunk_id long, n_chunk_tokens long"


def _chunk_count_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    from ..functions.bpe import get_token_counter

    count = get_token_counter()
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "chunk_id": pdf["chunk_id"],
                "n_chunk_tokens": pdf["chunk_text"]
                .map(count)
                .astype("int64"),
            }
        )


def q_seq_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.q_seq_pack's tokenizer-aware twin: identical chunking
    and range-exchange prefix-sum packing, but the global token axis
    counts REAL BPE tokens per chunk instead of whitespace words — what
    a pretraining pipeline actually packs context windows by. The BPE
    count runs in one Arrow-batched mapInPandas between the map-only
    chunker and the packer; the packing plan (no one-task window, tiny
    O(partitions) offset aggregate) is unchanged."""
    from .textops import chunk_docs, pack_sequences

    docs = load_table(spark, sf_dir, "documents").repartition(
        default_parallelism(), "doc_id"
    )
    counted = (
        chunk_docs(docs)
        .select("doc_id", "chunk_id", "chunk_text")
        .mapInPandas(_chunk_count_batches, CHUNK_BPE_SCHEMA)
    )
    return pack_sequences(counted)


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE token count next to the whitespace count.

    Rows-only contract query (a learned subword segmentation is not
    SQL-expressible); tests pin the Spark output to a driver-side
    pure-Python replica and the encoder itself to round-trip/
    determinism invariants."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        default_parallelism(), "doc_id"
    )
    return add_bpe_token_counts(docs)


# Distributed BPE TRAINING (round 5): merge-table learning, the
# training-side counterpart of the encoder above. Kept small so the
# driver-loop cost stays bounded; the replica test pins exact equality
# with functions/bpe.train_bpe on the same corpus.
N_TRAIN_MERGES = 24

# The pre-tokenizer regex of functions/bpe.pretokenize, verbatim (Java
# and Python regex agree on these ASCII classes; UTF-8 binary string
# comparison == code-point comparison, so tie-breaks agree too).
_PRETOKEN_SQL = r"regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+', 0)"


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED BPE tokenizer training over the documents corpus —
    the classic Sennrich merge loop re-expressed so the corpus is
    touched exactly ONCE: tokenize + count distinct pre-tokens (one
    linear scan + one shuffle on the word), then every merge round
    runs on the WORD-COUNT table (O(vocabulary), not O(corpus)):
    adjacent-pair counts via an indexed-transform + explode, the
    argmax pair via a 1-ROW bounded collect (count desc, pair desc —
    the exact tie-break of functions/bpe.train_bpe), and the merge
    applied vocabulary-wide as a JVM fold (``aggregate`` HOF replacing
    [.., a, b, ..] runs left-to-right — provably the same leftmost
    non-overlapping semantics as the reference scan, see the replica
    test). ``localCheckpoint`` per round truncates the growing lambda
    lineage (the HOF-codegen trap documented in BASELINE.md).

    Learned-tokenizer output is not SQL-expressible ⇒ rows-only driver
    check; tests/test_bpe.py pins the merge table EXACTLY equal to the
    pure-Python train_bpe on the same text, and that the learned table
    drives BPEEncoder round-trips.

    At 100 TB: the only corpus-sized work is the word count (the
    flagship wordcount plan); vocabulary tables are millions of rows,
    each round two bounded jobs — this is how production distributed
    BPE/WordPiece trainers are actually structured."""
    from pyspark.sql import functions as F

    from ..functions.bpe import EOW

    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(F.explode(F.expr(_PRETOKEN_SQL)).alias("tok"))
    words = (
        toks.where(F.trim(F.col("tok")) != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = words.select(
        F.concat(F.split("tok", ""), F.array(F.lit(EOW))).alias("sym"),
        "n",
    ).localCheckpoint()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(N_TRAIN_MERGES):
        pairs_arr = F.transform(
            F.slice(F.col("sym"), 1, F.size("sym") - 1),
            lambda x, i: F.struct(
                x.alias("a"),
                F.element_at(F.col("sym"), i + 2).alias("b"),
            ),
        )
        best = (
            vocab.select(F.explode(pairs_arr).alias("p"), "n")
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.desc("a"), F.desc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((rank, a, b, cnt))
        merged = a + b
        fold = F.aggregate(
            F.col("sym"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(merged)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        vocab = vocab.select(fold.alias("sym"), "n").localCheckpoint()

    return spark.createDataFrame(
        merges, "merge_rank long, left string, right string, pair_count long"
    )
