"""Round-5 wave-4 operators: salted join, int8 quantization report,
compaction planner, mergeable HLL sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs422pp_mapreduce_spark.sources.catalog import load_table


def test_skew_join_equals_plain_join(spark, sf_dir):
    """The salt/replicate/merge decomposition is lossless: identical
    row multiset to the plain unsalted join."""
    from cs422pp_mapreduce_spark.operators.relational import q_skew_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("type_n"),
    )
    plain = ev.join(dim, "event_type").select("event_id", "type_n")
    got = sorted(
        (r["event_id"], r["type_n"])
        for r in q_skew_join(spark, sf_dir).collect()
    )
    want = sorted((r["event_id"], r["type_n"]) for r in plain.collect())
    assert got == want
    assert len(got) == ev.count()


def test_skew_join_salt_spreads_hot_keys(spark, sf_dir):
    """The salted fact side really is spread: every (key, salt) bucket
    holds well under a full hot key's rows."""
    from cs422pp_mapreduce_spark.functions.skew import with_salt

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    per_bucket = (
        with_salt(ev, 16)
        .groupBy("event_type", "__salt")
        .count()
        .agg(F.max("count").alias("mx"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    hot = ev.groupBy("event_type").count().agg(F.max("count")).collect()[0][0]
    # 16-way spread: the biggest bucket is a small fraction of the
    # hottest key (allow 3x the ideal for hash variance)
    assert per_bucket["mx"] <= 3 * hot / 16
    assert per_bucket["n"] > 16  # multiple keys × salts actually exist


def test_embedding_quantize_bounds(spark, sf_dir):
    """Quantization invariants: int8 range, reconstruction error
    bounded by half a quantization step, full dimensionality."""
    from cs422pp_mapreduce_spark.operators.similarity import (
        q_embedding_quantize,
    )

    rows = q_embedding_quantize(spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vecs  # no all-zero vectors in the fixture
    for r in rows:
        assert r["n_dims"] == 64
        # q in [-127, 127] ⇒ qnorm_sq ≤ d·127²
        assert 0 < r["qnorm_sq"] <= 64 * 127 * 127
        # |x - q/scale| ≤ 0.5/scale (+ fp slack)
        assert r["max_abs_err"] <= 0.5 / r["scale"] * (1 + 1e-12)


def test_compaction_plan_partitions_files(spark, sf_dir):
    """Bins cover every file exactly once, keep contiguous id ranges,
    and a bin only exceeds the target by less than one file."""
    from cs422pp_mapreduce_spark.operators.maintenance import (
        q_compaction_plan,
    )
    from cs422pp_mapreduce_spark.oracles import COMPACT_TARGET_CHARS

    docs = load_table(spark, sf_dir, "documents")
    plan = q_compaction_plan(spark, sf_dir).collect()
    assert sum(r["n_files"] for r in plan) == docs.count()
    assert sum(r["total_chars"] for r in plan) == (
        docs.agg(F.sum("n_chars")).collect()[0][0]
    )
    by_source: dict[str, list] = {}
    for r in plan:
        by_source.setdefault(r["source"], []).append(r)
    max_file = docs.agg(F.max("n_chars")).collect()[0][0]
    for rs in by_source.values():
        rs.sort(key=lambda r: r["bin_id"])
        assert [r["bin_id"] for r in rs] == list(range(len(rs)))
        for prev, nxt in zip(rs, rs[1:]):
            assert prev["last_doc"] < nxt["first_doc"]  # contiguous runs
        # every bin except possibly the last is "full": adding its
        # first file pushed it past a bin boundary, so its size stays
        # under target + one max file
        for r in rs:
            assert r["total_chars"] < COMPACT_TARGET_CHARS + max_file


def test_hll_union_matches_direct_sketch(spark, sf_dir):
    """Mergeability: union of per-type sketches estimates EXACTLY what
    one direct sketch over all rows estimates, and both land within 5%
    of the exact distinct count."""
    from cs422pp_mapreduce_spark.operators.relational import q_hll_distinct

    ev = load_table(spark, sf_dir, "events")
    rows = {r["event_type"]: r for r in q_hll_distinct(spark, sf_dir).collect()}
    # r09 bound-contract shape: mergeability and the 5% error bound
    # are asserted IN-PLAN and ship as booleans the driver hashes
    assert rows["__all__"]["merge_exact"] is True
    for r in rows.values():
        assert r["within_bound"] is True
    assert sum(r["n_rows"] for t, r in rows.items() if t != "__all__") == (
        rows["__all__"]["n_rows"]
    )
