"""Corpus indexing for retrieval: fixed-size overlapping chunking (the RAG
ingest shape) and a capped inverted index (the search-engine build shape).

The reference stops at triples; a consumer of its KG at web scale
immediately needs the corpus sliced into retrievable units and a term
index over them (reference analog: the eval set's doc-level lookups in
/root/reference/src/neat_metrics.py are driver-side dict scans). Both ops
here are one-pass DataFrame plans with bounded per-group state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(df: DataFrame, chunk_size: int = 64, overlap: int = 16,
                    text_col: str = "text", id_col: str = "doc_id"
                    ) -> DataFrame:
    """(doc_id, chunk_id, start, n_tokens, chunk_hash): sliding-window
    chunking — chunks of ``chunk_size`` whitespace tokens every
    ``chunk_size - overlap`` tokens, last chunk ragged. Emits the md5 of
    the chunk (chr(31)-joined tokens) rather than the text so the output
    stays index-sized; a real ingest would emit the slice itself.

    100 TB shape: ENTIRELY narrow — split once, per-row F.sequence of
    chunk starts, posexplode, per-row slice. Zero shuffles, zero Python;
    chunk count per doc is n/step so output is ~n/step × input rows and
    streams through whole-stage codegen."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    step = chunk_size - overlap
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda w: w != "",
    )
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"), toks.alias("toks")
    ).where(F.size("toks") > 0)
    starts = F.sequence(
        F.lit(0), F.size("toks") - 1, F.lit(step)
    )
    exploded = base.select(
        "doc_id", "toks", F.posexplode(starts).alias("chunk_id", "start")
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, chunk_size)
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("start").cast("int").alias("start"),
        F.size(chunk).cast("int").alias("n_tokens"),
        F.md5(F.concat_ws("\x1f", chunk)).alias("chunk_hash"),
    )


def inverted_index(df: DataFrame, postings_cap: int = 16,
                   text_col: str = "text", id_col: str = "doc_id"
                   ) -> DataFrame:
    """(term, df, total_tf, postings): inverted index over the corpus —
    document frequency, total term frequency, and the first
    ``postings_cap`` doc_ids (ascending) per term. df/total_tf are EXACT
    over all docs; only the materialized posting list is capped (a real
    index shards long posting lists; a stopword's full list collected into
    one agg buffer is the OOM at web scale, hence cap-before-collect).

    100 TB shape: tokenize (narrow) → (doc_id, term) partial-agg count
    [shuffle 1] → one term-partitioned Window pass computing exact df /
    total_tf plus the doc_id rank [shuffle 2] → rank filter → final
    term agg reuses the Window's hash partitioning (no third exchange)."""
    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    w_all = Window.partitionBy("term")
    w_ord = w_all.orderBy("doc_id")
    ranked = tf.select(
        "term", "doc_id", "tf",
        F.count(F.lit(1)).over(w_all).alias("df"),
        F.sum("tf").over(w_all).alias("total_tf"),
        F.row_number().over(w_ord).alias("rn"),
    )
    return (
        ranked.where(F.col("rn") <= postings_cap)
        .groupBy("term")
        .agg(
            F.first("df").cast("long").alias("df"),
            F.first("total_tf").cast("long").alias("total_tf"),
            F.sort_array(F.collect_list("doc_id")).alias("postings"),
        )
    )
