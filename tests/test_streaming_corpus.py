"""The stateless text-pipeline stages run UNCHANGED as streaming
append-mode queries: chunking a document stream produces exactly the
batch result. (Gate/dedup stages are stateful — their streaming twins
live in streaming/dedup.py; this pins the map-only stages.)"""

from __future__ import annotations


from cs422pp_mapreduce_spark.operators.textops import chunk_docs
from cs422pp_mapreduce_spark.sources.catalog import load_table


def test_streaming_chunking_equals_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_stream")
    # two arrival batches
    docs.where("doc_id % 2 = 0").write.mode("append").parquet(src)
    docs.where("doc_id % 2 = 1").write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        chunk_docs(stream)
        .writeStream.format("memory")
        .queryName("t_stream_chunks")
        .outputMode("append")  # stateless: no aggregation state at all
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        for r in spark.table("t_stream_chunks").collect()
    }
    want = {
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_docs(docs).collect()
    }
    assert got == want


def test_streaming_winnowing_equals_batch(spark, sf_dir, tmp_path):
    from cs422pp_mapreduce_spark.operators.textops import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_stream_w")
    docs.where("doc_id % 2 = 0").write.mode("append").parquet(src)
    docs.where("doc_id % 2 = 1").write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        winnow_fingerprints(stream)
        .writeStream.format("memory")
        .queryName("t_stream_winnow")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["doc_id"], r["fp"])
        for r in spark.table("t_stream_winnow").collect()
    }
    want = {
        (r["doc_id"], r["fp"]) for r in winnow_fingerprints(docs).collect()
    }
    assert got == want
