"""Distributed suffix-array substring dedup (VERDICT r10 ask #5).

The full Lee et al. 2022 path ("Deduplicating Training Data Makes
Language Models Better"): find each position's LONGEST repeated
substring via a suffix array, not fixed-k shingles (q_dedup_substring
is the k-bounded approximation; this module computes exact maximal
repeat lengths).

Construction is Manber–Myers prefix doubling re-expressed as DataFrame
ops — the "log n range-exchange sorts" form:

* rank_0 = global dense rank of the single token at each position;
* rank_k = global dense rank of the pair (rank_{k-1}[p],
  rank_{k-1}[p + 2^(k-1)]) — one positional self-join (the range
  exchange) plus one distributed dense rank per level, K =
  ceil(log2(min(max_doc_tokens, SUFFIX_CAP))) levels total;
* every global rank uses the q_global_rank kernel (range-repartition →
  per-partition rank → tiny per-partition offset broadcast), never a
  single-partition window;
* the suffix ARRAY is the row_number of (rank_K, doc_id, pos);
  adjacent SA entries' LCP is computed by the classic rank-table
  descent (for k = K..0: if rank_k agrees at the current offsets,
  advance both by 2^k) — 2 positional joins per level against the
  persisted rank tables, O(n log n) total exchanged longs, and the
  longest repeated prefix of a suffix is max(LCP with SA-prev, LCP
  with SA-next);
* spans: positions whose repeat length ≥ SUFFIX_MIN_TOKENS cover
  [pos, pos + lcp), merged per document by the gaps-and-islands
  running-max window.

Suffixes never cross documents (each suffix is doc-local), so no
sentinel plumbing is needed; ties between IDENTICAL suffixes break on
(doc_id, pos) in both engines. Comparisons truncate at
CMP = 2^K ≥ min(max_doc_tokens, SUFFIX_CAP) tokens and reported
lengths clamp to CMP — vacuous on every fixture (docs are ≤ ~100
tokens at all SFs) but the declared behavior if a corpus exceeds the
cap; the DuckDB oracle slices suffixes with the same arithmetic.

At 100 TB: total cost is O(n log n) shuffled 8-byte rank tuples over
K ≈ log2(cap) passes — each pass a range exchange Spark parallelizes
freely — versus the O(n·k) string bytes a k-gram materialization
ships; state is 3-long rows, no strings after rank_0.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel as PySparkStorageLevel

from ..functions.text import nonempty_tokens
from ..session import default_parallelism, scratch_persist
from ..sources.catalog import load_table

# Minimum repeated-substring length (tokens) for a position to count
# as duplicated — the Lee-et-al. span threshold at fixture scale
# (matches dedup_substring's SUBSTR_K shingle width; the driver's
# sf0.001 slice tops out at 5-token chance repeats, larger fixtures
# carry the planted 60-90-token lede/near-dup structure).
SUFFIX_MIN_TOKENS = 5
# Comparison cap: suffixes compare on their first 2^ceil(log2(min(
# max_doc_tokens, SUFFIX_CAP))) tokens. Never binds on the fixtures.
SUFFIX_CAP = 512


def _global_rank(
    df: DataFrame,
    cols: list[str],
    out: str,
    dense: bool,
    locals_out: list | None = None,
) -> DataFrame:
    """Global (dense_)rank over ``cols`` without the single-partition
    window: range-repartition on the keys, rank per partition, add the
    broadcast per-partition offsets (the q_global_rank kernel,
    relational.py:437 — dense variant offsets by distinct-key counts;
    equal keys land in one range partition, so local dense ranks are
    globally consistent). Persisted before branching so the offsets
    and the final join see the SAME sampled range boundaries."""
    ranged = df.repartitionByRange(
        default_parallelism(), *[F.col(c) for c in cols]
    ).withColumn("pid", F.spark_partition_id())
    w = Window.partitionBy("pid").orderBy(*cols)
    rank_fn = F.dense_rank() if dense else F.row_number()
    local = ranged.withColumn("_lr", rank_fn.over(w))
    if locals_out is not None:
        # checkpointing caller: it releases this persist as soon as
        # the level materializes (9 resident n-row frames otherwise
        # accumulate PER RUN under the 8g local heap — the sf3 tier's
        # superlinear signature)
        from pyspark.storagelevel import StorageLevel

        local = local.persist(StorageLevel.MEMORY_AND_DISK)
        locals_out.append(local)
    else:
        local = scratch_persist(local)
    per_part = (
        F.countDistinct(*cols) if dense else F.count(F.lit(1))
    ).alias("n")
    offsets = (
        local.groupBy("pid")
        .agg(per_part)
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .withColumn(out, (F.col("_lr") + F.col("_off")).cast("long"))
        .drop("pid", "_lr", "_off")
    )


def suffix_rank_tables(
    pos: DataFrame, levels: int, n_positions: int, checkpoint: bool = True
) -> dict[int, DataFrame]:
    """rank_k tables for k = 0..levels: rank_k[p] is an order- and
    equality-preserving class id of the first 2^k tokens of the suffix
    at p, with end-of-doc padded as -1/0 (shorter suffixes sort first,
    like the oracle's native list comparison).

    Odd levels COMBINE the two half-ranks arithmetically
    (r1·(n+2) + r2+1 — order-isomorphic to the (r1, r2) pair, fits a
    long because compacted ranks are ≤ n) instead of re-sorting; even
    levels COMPACT back to ≤ n via the global dense rank. This halves
    the number of global sorts — the dominant cost — while every
    level's table remains a valid equivalence class for the LCP
    descent (which only tests equality).

    localCheckpoint per level (the bpe_train lineage-truncation
    precedent): without it the level-k logical plan embeds level k-1
    TWICE — 2^K copies of rank_0 by the top, and Catalyst analysis
    time doubles per level. Checkpointing materializes each level
    once (declared driver-paced build work) and keeps every
    downstream plan shallow.

    Checkpoints go to DISK_ONLY (r12, the sf10 tier's OOM catch): the
    LCP descent is one lazy plan that reads ALL K+1 level tables when
    `pairs` materializes, so every level is resident simultaneously —
    at 27.5 M positions the default deserialized MEMORY_AND_DISK
    blocks (~1.4 GB/level × 8 levels) blew the 8 g local heap during
    level unroll. The level tables are the algorithm's O(n log n)
    byte cost and belong on the storage tier; each is written once
    and scanned twice (next level + its descent step), the sequential
    pattern disk serves fine (sf0.1 bench row unchanged within
    noise).

    r13 optimization pass (values bit-identical, job count cut):

    * rank_0 ranks the DISTINCT token vocabulary and broadcast-joins
      the class id back onto positions — dense rank depends only on
      the distinct-key ordering, so the per-position values are the
      same longs, but the global-sort kernel now runs on |vocab| rows
      instead of n and the position table is never range-shuffled for
      level 0 (guide §2.3: shuffle keys, not payloads). The broadcast
      is bounded by the vocabulary, which grows sublinearly in corpus
      size for token streams (Heaps' law; the byte-level Lee et al.
      formulation has |vocab| = 256) — if a corpus ever outgrew that,
      swap the hint for a shuffle join, same values.
    * ODD (combine) levels are lazy DISK_ONLY persists instead of
      eager localCheckpoints: the combine is a projection over the
      pairing join, so materializing it as its own driver-paced job
      bought nothing — the persist populates inside the next level's
      job, every later consumer (next pairing, LCP descent) still
      reads the materialized DISK_ONLY blocks, and the plan stays
      shallow because both join inputs are the previous EVEN level's
      checkpoint. Same storage-tier residency as the r12 fix, ~K/2
      fewer sequential driver-paced jobs.
    * each even level's ``paired`` join is persisted for the duration
      of its global rank, so the range-exchange's boundary-sampling
      pass does not recompute the join (released with the level's
      other scratch frames)."""
    def _ckpt(df: DataFrame) -> DataFrame:
        # checkpoint=False is the ANALYSIS-TWIN mode (plans/analysis):
        # fully lazy, shallow because the twin runs a single level
        if not checkpoint:
            return scratch_persist(df)
        out = df.localCheckpoint(
            eager=True, storageLevel=PySparkStorageLevel.DISK_ONLY
        )
        for fr in _locals:
            try:
                fr.unpersist()
            except Exception:  # noqa: BLE001
                pass
        _locals.clear()
        return out

    _locals: list = []

    base = n_positions + 2
    lo = _locals if checkpoint else None
    vocab_rank = _global_rank(
        pos.select("tok").distinct(), ["tok"], "r", dense=True,
        locals_out=lo,
    ).select("tok", "r")
    ranks: dict[int, DataFrame] = {
        0: _ckpt(
            pos.join(F.broadcast(vocab_rank), "tok").select(
                "doc_id", "pos", "r"
            )
        )
    }
    for k in range(1, levels + 1):
        h = 1 << (k - 1)
        prev = ranks[k - 1]
        shifted = prev.select(
            F.col("doc_id").alias("_d"),
            (F.col("pos") - h).alias("_p"),
            F.col("r").alias("_r2"),
        )
        paired = prev.join(
            shifted,
            (F.col("doc_id") == F.col("_d"))
            & (F.col("pos") == F.col("_p")),
            "left",
        ).select(
            "doc_id",
            "pos",
            F.col("r").alias("r1"),
            F.coalesce("_r2", F.lit(-1)).alias("r2"),
        )
        if k % 2 == 1:
            # combine: no sort; values < (n+2)^2 < 2^63 for n < 3e9.
            # (r1 is compacted ≤ n at every odd level: level 0 is
            # compact and every even level re-compacts.)
            lvl = paired.select(
                "doc_id",
                "pos",
                (
                    F.col("r1") * F.lit(base) + F.col("r2") + F.lit(1)
                ).alias("r"),
            )
            # lazy DISK_ONLY persist, not an eager checkpoint: the
            # combine is one projection over the pairing join of the
            # (checkpointed) even level below — shallow plan, same
            # storage-tier residency, one less sequential job.
            ranks[k] = scratch_persist(
                lvl,
                PySparkStorageLevel.DISK_ONLY if checkpoint else None,
            )
        else:
            if checkpoint:
                # released by _ckpt below; saves the range-exchange
                # sampler recomputing the pairing join
                paired = paired.persist(
                    PySparkStorageLevel.MEMORY_AND_DISK
                )
                _locals.append(paired)
            lvl = _global_rank(
                paired, ["r1", "r2"], "r", dense=True, locals_out=lo
            ).select("doc_id", "pos", "r")
            ranks[k] = _ckpt(lvl)
    return ranks


def q_dedup_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array substring-dedup report: one row per document that
    contains at least one substring of ≥ SUFFIX_MIN_TOKENS tokens
    occurring elsewhere in the corpus (or again inside the document),
    with (n_tokens, lrs_len = the document's longest repeated
    substring length, dup_tokens = tokens covered by qualifying
    repeats, n_spans = merged maximal spans).

    HASH-VERIFIED: the DuckDB oracle brute-forces the suffix array at
    gate scale (materialize every doc-local suffix, sort by native
    list comparison with the same (doc_id, pos) tiebreak, LCP adjacent
    pairs elementwise) — the prefix-doubling ranks, the descent LCP,
    and the island merge must reproduce it exactly.

    Declared build-time work (the bpe_train class): one 1-row
    (max-doc-length, total-positions) collect that fixes the number of
    doubling passes and the combine base — deterministic for a given
    fixture."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", nonempty_tokens("text").alias("t")
    ).where(F.size("t") >= 1)
    lens = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    pos = (
        toks.select("doc_id", F.posexplode("t"))
        .select(
            "doc_id", (F.col("pos") + 1).alias("pos"), F.col("col").alias("tok")
        )
    )

    maxlen, n_positions = toks.agg(
        F.max(F.size("t")), F.sum(F.size("t"))
    ).collect()[0]  # 1-row bounded
    if not maxlen:
        return spark.createDataFrame(
            [],
            "doc_id long, n_tokens long, lrs_len long, "
            "dup_tokens long, n_spans long",
        )
    levels = max(1, math.ceil(math.log2(min(maxlen, SUFFIX_CAP))))
    return suffix_report(pos, lens, levels, int(n_positions))


def suffix_report(
    pos: DataFrame,
    lens: DataFrame,
    levels: int,
    n_positions: int,
    checkpoint: bool = True,
) -> DataFrame:
    """SA build → adjacent-LCP descent → per-position longest repeat →
    island-merged per-doc report (shared by q_dedup_suffix and its
    lazy analysis twin, which passes checkpoint=False and a single
    level — same schema, same plan shape, no build-time jobs)."""
    cmp_cap = 1 << levels

    ranks = suffix_rank_tables(pos, levels, n_positions, checkpoint)

    sa_locals: list = []
    sa = _global_rank(
        ranks[levels],
        ["r", "doc_id", "pos"],
        "sa",
        dense=False,
        locals_out=sa_locals if checkpoint else None,
    ).select("doc_id", "pos", "sa")
    if checkpoint:
        sa = sa.localCheckpoint(
            eager=True, storageLevel=PySparkStorageLevel.DISK_ONLY
        )
        for fr in sa_locals:
            try:
                fr.unpersist()
            except Exception:  # noqa: BLE001
                pass
    else:
        sa = scratch_persist(sa)
    nxt = sa.select(
        (F.col("sa") - 1).alias("sa"),
        F.col("doc_id").alias("db"),
        F.col("pos").alias("pb"),
    )
    st = sa.join(nxt, "sa").select(
        F.col("doc_id").alias("da"),
        F.col("pos").alias("pa"),
        "db",
        "pb",
        F.lit(0).cast("long").alias("lcp"),
    )

    # LCP descent over the persisted rank tables: at level k the
    # classes agree iff the next 2^k tokens agree, so advance both
    # cursors by 2^k and keep descending.
    for k in range(levels, -1, -1):
        step = 1 << k
        ra = ranks[k].select(
            F.col("doc_id").alias("da"),
            F.col("pos").alias("_qa"),
            F.col("r").alias("_ra"),
        )
        rb = ranks[k].select(
            F.col("doc_id").alias("db"),
            F.col("pos").alias("_qb"),
            F.col("r").alias("_rb"),
        )
        st = (
            st.withColumn("_qa", F.col("pa") + F.col("lcp"))
            .withColumn("_qb", F.col("pb") + F.col("lcp"))
            .join(ra, ["da", "_qa"], "left")
            .join(rb, ["db", "_qb"], "left")
            .withColumn(
                "lcp",
                F.col("lcp")
                + F.when(
                    F.col("_ra").isNotNull()
                    & F.col("_rb").isNotNull()
                    & (F.col("_ra") == F.col("_rb")),
                    F.lit(step),
                ).otherwise(F.lit(0)),
            )
            .drop("_qa", "_qb", "_ra", "_rb")
        )

    # clamp: class equality at level k can overshoot for two IDENTICAL
    # suffixes shorter than 2^k; the true LCP never exceeds either
    # remaining length (or the comparison cap)
    la = lens.select(F.col("doc_id").alias("da"), F.col("n_tokens").alias("_na"))
    lb = lens.select(F.col("doc_id").alias("db"), F.col("n_tokens").alias("_nb"))
    pairs = (
        st.join(la, "da")
        .join(lb, "db")
        .withColumn(
            "lcp",
            F.least(
                "lcp",
                F.col("_na") - F.col("pa") + 1,
                F.col("_nb") - F.col("pb") + 1,
                F.lit(cmp_cap).cast("long"),
            ),
        )
        .select("da", "pa", "db", "pb", "lcp")
    )
    # both union branches read pairs; the descent chain above is
    # 2(levels+1) joins deep — truncate before the fanout
    pairs = (
        pairs.localCheckpoint(
            eager=True, storageLevel=PySparkStorageLevel.DISK_ONLY
        )
        if checkpoint
        else scratch_persist(pairs)
    )

    lrs = (
        pairs.select(F.col("da").alias("doc_id"), F.col("pa").alias("pos"), "lcp")
        .unionByName(
            pairs.select(
                F.col("db").alias("doc_id"), F.col("pb").alias("pos"), "lcp"
            )
        )
        .groupBy("doc_id", "pos")
        .agg(F.max("lcp").alias("lcp"))
    )

    hits = lrs.where(F.col("lcp") >= SUFFIX_MIN_TOKENS).select(
        "doc_id", "pos", "lcp", (F.col("pos") + F.col("lcp") - 1).alias("e")
    )
    by_pos = Window.partitionBy("doc_id").orderBy("pos")
    cum_end = F.max("e").over(
        by_pos.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = hits.withColumn(
        "grp",
        F.sum(
            (F.col("pos") > F.coalesce(cum_end, F.lit(-1)) + 1).cast("long")
        ).over(by_pos),
    )
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("s"),
        F.max("e").alias("e2"),
        F.max("lcp").alias("span_lrs"),
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.max("span_lrs").alias("lrs_len"),
            F.sum(F.col("e2") - F.col("s") + 1).alias("dup_tokens"),
            F.count(F.lit(1)).alias("n_spans"),
        )
        .join(lens, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.col("lrs_len").cast("long").alias("lrs_len"),
            F.col("dup_tokens").cast("long").alias("dup_tokens"),
            F.col("n_spans").cast("long").alias("n_spans"),
        )
    )
