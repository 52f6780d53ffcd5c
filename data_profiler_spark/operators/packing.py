"""Sequence packing: assign documents to fixed-token-length training
sequences (GPT-style concat-then-chunk) without a global sort.

The last step of a pretraining data pipeline is turning cleaned documents
into training sequences of exactly ``seq_len`` tokens: concatenate all
documents in a canonical order and cut every ``seq_len`` tokens (documents
may straddle a cut — the standard packing used by GPT-style training).
The assignment each doc needs is just its GLOBAL token offset in that
concatenation — a prefix sum over a canonical order, which naively is a
``Window.orderBy`` over the whole corpus: single partition, non-starter.

Scale shape (the ``token_budget_sample`` trick): the canonical order is
``(md5(id), id)`` — uniform by construction — so its 12-bit hash prefix
partitions the order into 4096 contiguous, balanced ranges:

1. one ≤4096-key agg: per-bucket token totals → driver prefix offsets
   (bounded driver state, one pass);
2. per-bucket window cumsum (each bucket is ~n/4096 rows on one task —
   balanced BY HASH UNIFORMITY, no data-dependent skew) + the broadcast
   bucket offset → exact global offset.

Two passes over (id, tokens) — the document TEXT never moves; the actual
concatenation happens later, sequence-partitioned, reading only the docs
each output partition needs (``seq_id`` is the partition key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PACK_BUCKETS_BITS = 12  # 4096 hash-prefix buckets; driver state = one row each


def pack_sequences(
    df: DataFrame,
    tokens: Column,
    seq_len: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Global packing assignment: ``(id, tokens, global_offset, seq_id,
    offset_in_seq)`` for every doc, where ``global_offset`` is the doc's
    token start in the md5-ordered concatenation of the corpus,
    ``seq_id = global_offset // seq_len`` the training sequence its first
    token lands in, ``offset_in_seq`` the position inside it. Documents
    with NULL token counts pack as 0 tokens (they occupy no room but
    keep a defined slot); documents with a NULL id are EXCLUDED — a null
    id has no stable position in the canonical order, so including them
    would make the packing nondeterministic. Exact and deterministic —
    the DuckDB oracle replays the same order with one global window."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    df = df.filter(F.col(id_col).isNotNull())
    h = F.md5(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col),
        F.coalesce(tokens.cast("long"), F.lit(0)).alias("tokens"),
        h.alias("_h"),
        F.conv(F.substring(h, 1, PACK_BUCKETS_BITS // 4), 16, 10)
        .cast("long")
        .alias("_b"),
    )
    totals = {
        r["_b"]: r["t"]
        for r in base.groupBy("_b").agg(F.sum("tokens").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(b), int(o)) for b, o in offsets.items()], "_b long, _off long"
        )
    )
    w = (
        Window.partitionBy("_b")
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_end = F.sum("tokens").over(w)
    return (
        base.withColumn("_cum_end", cum_end)
        .join(off_df, "_b")
        .select(
            F.col(id_col),
            "tokens",
            (F.col("_off") + F.col("_cum_end") - F.col("tokens")).alias("global_offset"),
            F.floor(
                (F.col("_off") + F.col("_cum_end") - F.col("tokens")) / F.lit(seq_len)
            )
            .cast("long")
            .alias("seq_id"),
            F.pmod(F.col("_off") + F.col("_cum_end") - F.col("tokens"), F.lit(seq_len))
            .cast("long")
            .alias("offset_in_seq"),
        )
    )
