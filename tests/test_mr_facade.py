"""MRJob facade: the reference's programming contract end-to-end on
Spark, including the first-char partitioner layout and text sink."""

from __future__ import annotations

import operator
import os
import tempfile

from cs422pp_mapreduce_spark.operators.mr import MRJob, first_char_partitioner


def test_mr_wordcount_pipeline(spark, tmp_path):
    # reference input contract: lines of single-space-separated tokens
    path = str(tmp_path / "input.txt")
    with open(path, "w") as f:
        f.write("the quick fox\nthe lazy dog\nthe fox\n")
    result = dict(
        MRJob.from_text(spark, path)
        .flat_map(lambda line: line.split(" "))
        .filter(lambda w: w != "")
        .map_to_pairs(lambda w: (w, 1))
        .combine_reduce(operator.add)
        .sort()
        .collect()
    )
    assert result == {"the": 3, "quick": 1, "fox": 2, "lazy": 1, "dog": 1}


def test_group_reduce_matches_combine_reduce(spark, tmp_path):
    path = str(tmp_path / "input.txt")
    with open(path, "w") as f:
        f.write("a b a\nb c\n")
    base = (
        MRJob.from_text(spark, path)
        .flat_map(lambda line: line.split(" "))
        .map_to_pairs(lambda w: (w, 1))
    )
    fast = dict(base.combine_reduce(operator.add).collect())
    slow = dict(base.group_reduce(lambda _k, vs: sum(vs)).collect())
    assert fast == slow


def test_first_char_partitioner_layout(spark):
    # thread_pool.cc:121-134 semantics: same first char → same partition
    pairs = [("apple", 1), ("avocado", 2), ("banana", 3), ("cherry", 4)]
    rdd = spark.sparkContext.parallelize(pairs)
    job = MRJob(spark, rdd).partition_by(3, first_char_partitioner(3))
    parts = job.rdd.glom().collect()
    by_word = {
        w: i for i, part in enumerate(parts) for (w, _) in part
    }
    assert by_word["apple"] == by_word["avocado"]
    assert by_word["apple"] == ord("a") % 3


def test_sink_text_reference_format(spark, tmp_path):
    out = str(tmp_path / "out")
    rdd = spark.sparkContext.parallelize([("b", 2), ("a", 1)], 1)
    MRJob(spark, rdd).sort().sink_text(out)
    lines = []
    for f in sorted(os.listdir(out)):
        if f.startswith("part-"):
            lines += open(os.path.join(out, f)).read().splitlines()
    assert lines == ["a 1", "b 2"]
