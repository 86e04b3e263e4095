"""Training-sequence packing and quality-weighted corpus sampling — the two
ops that turn a curated corpus into a training mix.

* pack_sequences: GPT-style concatenate-then-chunk metadata — documents are
  concatenated in doc_id order within a shard and cut into fixed
  token-budget sequences; each doc gets (shard, seq_id, offset) so a
  downstream tokenizer can materialize sequences without re-scanning order.
* quality_sample: deterministic quality-weighted downsampling (the
  CCNet/DCLM-style mix step) — keep probability is a function of the
  quality score, the draw is a portable md5 hash of the doc id, so any
  engine reproduces the identical sample (no RNG, no seed drift).

Reference analog: the reference's train-set assembly concatenates and
splits its labeled corpora deterministically (src/dataset.py split
handling); these generalize that to token-budgeted packing at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import bpe_token_estimate

PACK_SHARDS = 8          # parallelism unit: windows never cross a shard
PACK_BUDGET = 256        # tokens per training sequence (parameter)


def pack_sequences(df: DataFrame, budget: int = PACK_BUDGET,
                   n_shards: int = PACK_SHARDS, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shard, n_tokens, seq_id, offset): concatenate-then-chunk
    packing metadata. Docs are laid out in doc_id order within their shard
    (shard = doc_id % n_shards — portable, no hash drift); a doc starting at
    cumulative token position c occupies seq floor(c / budget) at offset
    c % budget (docs may straddle sequence boundaries, exactly like GPT-style
    pretraining packing).

    100 TB shape: the ONLY window is partitioned by shard — shards are the
    parallelism unit, the same way a real packing job shards its corpus;
    there is no global cumsum. Token counts are the row-side BPE estimate
    (whole-stage codegen), so the packing pass is one scan + one shard-keyed
    shuffle. n_shards scales with the cluster, budget with the model."""
    # the window orders by the RENAMED column: toks below aliases id_col to
    # doc_id, so ordering by id_col would fail analysis for any caller whose
    # id column isn't literally named "doc_id" (ADVICE r3).
    w = (
        Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        bpe_token_estimate(F.col(text_col)).alias("n_tokens"),
    )
    cum = toks.withColumn("cum_after", F.sum("n_tokens").over(w))
    start = F.col("cum_after") - F.col("n_tokens")
    return cum.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "shard",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(start / budget).cast("long").alias("seq_id"),
        (start % budget).cast("long").alias("offset"),
    )


def quality_sample(df: DataFrame, floor_prob: float = 0.25,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, quality_score, keep_prob, draw): the kept subset under
    quality-weighted sampling — keep probability rises linearly from
    floor_prob (worst docs still get a floor, preserving diversity) to 1.0
    (best docs always kept); the draw is md5(doc_id)/2^32, bit-identical in
    any engine. Filtering is row-local: one scan, zero shuffles."""
    from .textstats import quality_stats

    qs = quality_stats(df, text_col=text_col, id_col=id_col)
    # 6dp, not 4: quality_score sits on a 1e-4 grid, so the affine map's true
    # value sits on a 1e-6 grid — rounding at 6dp has no halfway cases, while
    # 4dp lands ON them (0.25 + 0.75*0.5638 = .67285) and engines split 1ulp.
    keep_prob = F.round(
        F.lit(floor_prob) + (1.0 - floor_prob) * F.col("quality_score"), 6
    )
    draw = F.round(
        F.conv(F.substring(F.md5(F.concat(F.lit("qs:"),
                                          F.col("doc_id").cast("string"))), 1, 8),
               16, 10).cast("double") / F.lit(4294967296.0), 10
    )
    return (
        qs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("quality_score"),
            keep_prob.alias("keep_prob"),
            draw.alias("draw"),
        )
        .where(F.col("draw") < F.col("keep_prob"))
    )


def temperature_mix(df: DataFrame, alpha: float = 0.7,
                    budget_tokens: int = 100_000, text_col: str = "text",
                    source_col: str = "source") -> DataFrame:
    """(source, n_docs, n_tokens, weight, budget_share, epochs): the
    temperature-scaled multi-source mixture every multilingual/multi-domain
    pretraining run computes (mBERT/XLM-R exponential smoothing, Pile-style
    domain weights): source s gets sampling weight n_tokens_s^alpha
    normalized over sources, a token share of the training budget, and the
    implied epoch count (budget_share / n_tokens — >1 means the source is
    repeated, the low-resource upsampling temperature mixing exists for).

    100 TB shape: one corpus scan + one source-keyed agg; sources are a
    handful of rows, so the normalizing total is a 1-row agg broadcast back
    (crossJoin of a broadcast singleton — never a corpus-wide window). The
    per-source aggregates are exact integers; the floats derive per-row from
    those integers (pow/div are order-independent), the repo's cross-engine
    float convention."""
    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
        .cast("long").alias("n_tokens"),
    )
    # alpha=0.5 routes through sqrt, which IEEE-754 requires to be exactly
    # rounded in every engine — the deterministic/oracle twin of the general
    # pow path (libm pow is only faithfully rounded and may differ 1 ulp
    # across engines; same twin convention as seed_centroids vs kmeans).
    if alpha == 0.5:
        raw = F.sqrt(F.col("n_tokens").cast("double"))
    else:
        raw = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    scaled = per.withColumn("w_raw", raw)
    total = scaled.agg(F.sum("w_raw").alias("w_total"))
    return (
        scaled.crossJoin(F.broadcast(total))
        .select(
            "source", "n_docs", "n_tokens",
            F.round(F.col("w_raw") / F.col("w_total"), 6).alias("weight"),
            F.round(F.lit(float(budget_tokens)) * F.col("w_raw")
                    / F.col("w_total"), 2).alias("budget_share"),
            F.round(F.lit(float(budget_tokens)) * F.col("w_raw")
                    / F.col("w_total") / F.col("n_tokens"), 6).alias("epochs"),
        )
    )
