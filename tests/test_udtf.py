"""Python UDTF (Spark 4 table-function API): the imperative 1→N escape
hatch, differentialed against the relational chunker it reimplements."""

from __future__ import annotations

from kafkastreamingetl_spark.catalog import load_table
from kafkastreamingetl_spark.operators.corpus import chunk_documents
from kafkastreamingetl_spark.udtfs import ChunkText

SF = "/root/testdata/sf0.001"


def test_udtf_chunks_match_relational_chunker(spark):
    spark.udtf.register("chunk_text", ChunkText)
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    docs.createOrReplaceTempView("udtf_docs")
    relational = {
        (r.doc_id, r.chunk_id): r.chunk
        for r in chunk_documents(docs).collect()
    }
    lateral = {
        (r.doc_id, r.chunk_id): r.chunk
        for r in spark.sql(
            "SELECT doc_id, chunk_id, chunk "
            "FROM udtf_docs, LATERAL chunk_text(text)"
        ).collect()
    }
    assert lateral == relational


def test_udtf_null_text_yields_one_empty_chunk(spark):
    spark.udtf.register("chunk_text", ChunkText)
    spark.createDataFrame(
        [(1, None)], "doc_id long, text string"
    ).createOrReplaceTempView("udtf_null_doc")
    rows = spark.sql(
        "SELECT doc_id, chunk_id, chunk "
        "FROM udtf_null_doc, LATERAL chunk_text(text)"
    ).collect()
    assert len(rows) == 1
    assert rows[0].chunk_id == 0 and rows[0].chunk == ""
