"""Incremental exact dedup (new crawl vs existing corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_profiler_spark.operators.dedup import (
    corpus_content_hashes,
    incremental_dedup,
)


def _tables(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (10, "alpha"),   # already in corpus → dropped
            (11, "delta"),   # new → kept
            (12, "delta"),   # within-batch dup of 11 → dropped
            (13, "beta"),    # already in corpus → dropped
            (14, "epsilon"), # new → kept
            (15, None),      # new null text → kept (first null)
            (16, None),      # within-batch dup of the null → dropped
        ],
        "doc_id long, text string",
    )
    return corpus, new


def test_incremental_dedup_semantics(spark):
    corpus, new = _tables(spark)
    out = incremental_dedup(new, corpus)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert sorted(rows) == [11, 14, 15]
    # original columns survive, content_hash rides along for the
    # maintained-hash-table append
    assert set(out.columns) == {"content_hash", "doc_id", "text"}
    assert rows[11]["text"] == "delta"


def test_incremental_dedup_precomputed_hashes_match(spark):
    corpus, new = _tables(spark)
    direct = incremental_dedup(new, corpus)
    via_hashes = incremental_dedup(
        new, corpus_content_hashes(corpus), corpus_is_hashes=True
    )
    assert sorted(r["doc_id"] for r in direct.collect()) == sorted(
        r["doc_id"] for r in via_hashes.collect()
    )


def test_incremental_dedup_plan_shape(documents, spark):
    """Anti join (never a filter-collect), and the corpus scan reads only
    the text column it hashes — 100 TB of other columns stay unread."""
    # other suites cache a DF with this exact parquet lineage; drop cached
    # plans so the scan (and its ReadSchema) is what this test inspects
    spark.catalog.clearCache()
    corpus = documents.filter(F.col("doc_id") % 5 == 0)
    new = documents.filter(F.col("doc_id") % 5 != 0)
    out = incremental_dedup(new, corpus)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    import re

    reads = re.findall(r"ReadSchema: struct<[^>]*>", plan)
    # corpus side: only the filter key + the hashed text column — lang/
    # source/n_chars (100 TB of payload at scale) never leave the scan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in reads, reads


def test_incremental_dedup_null_text_null_safe(spark):
    """sha2(NULL) is NULL; the anti join must be null-safe or one
    null-text doc slips through on every crawl cycle."""
    corpus = spark.createDataFrame([(1, None), (2, "x")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, None), (11, None), (12, "y")], "doc_id long, text string"
    )
    out = incremental_dedup(new, corpus)
    assert sorted(r["doc_id"] for r in out.collect()) == [12]
