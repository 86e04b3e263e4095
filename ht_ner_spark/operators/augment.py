"""AR7: entity-run substitution augmentation.

Reference (/root/reference/src/dataset.py:157-219): replace each LOC-tagged
token run with a RANDOM street name, re-tokenize the replacement, and re-tag
(B-LOC on the first replacement token, I-LOC on the rest). The reference
draws from `random`; our version picks DETERMINISTICALLY by hashing the run's
content (same corpus + same replacement list -> same augmented output, a
requirement for resumable/idempotent pipelines).

Spark shape (SURVEY §2.8 AR7): gaps-and-islands run detection via the W2
window pattern, replacement chosen with
`element_at(replacements, 1 + pmod(hash(run_text), size))` — pure column
ops, one shuffle (the per-row window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def substitute_tag_runs(df: DataFrame, replacements: list[str],
                        target: str = "LOC",
                        tokens_col: str = "tokens",
                        tags_col: str = "tags",
                        id_col: str = "row_id",
                        portable_hash: bool = False) -> DataFrame:
    """-> (id, tokens, tags, aug_tokens, aug_tags): every B-target/I-target
    run replaced by a deterministic pick from ``replacements`` (whitespace
    re-tokenized, B-/I- re-tagged); all other positions unchanged.

    portable_hash=True picks via md5 (bit-identical in DuckDB — the
    correctness-oracle variant, same pattern as minhash use_md5); the
    default xxhash64 is the faster JVM path."""
    spark_reps = F.array(*[F.lit(r) for r in replacements])

    t = df.select(
        F.col(id_col).alias("row_id"),
        F.posexplode(F.arrays_zip(tokens_col, tags_col)).alias("pos", "tt"),
    ).select(
        "row_id", "pos",
        F.col("tt")[tokens_col].alias("tok"),
        F.col("tt")[tags_col].alias("tag"),
    )
    is_target = F.col("tag").isin(f"B-{target}", f"I-{target}")
    w = Window.partitionBy("row_id").orderBy("pos")
    # new run starts at B- or at I- not preceded by target (fixBIO tolerance)
    flagged = t.withColumn(
        "_new",
        F.when(
            is_target
            & (
                (F.col("tag") == f"B-{target}")
                | ~F.coalesce(
                    F.lag("tag").over(w).isin(f"B-{target}", f"I-{target}"),
                    F.lit(False),
                )
            ),
            1,
        ).when(is_target, 0).otherwise(1),
    ).withColumn(
        "_grp", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    # one segment per (row, grp); target segments get a replacement
    segs = flagged.groupBy("row_id", "_grp").agg(
        F.min("pos").alias("pos"),
        F.max(F.when(is_target, 1).otherwise(0)).alias("is_target"),
        F.collect_list(F.struct("pos", "tok", "tag")).alias("items"),
    )
    run_text = F.concat_ws(" ", F.transform(F.array_sort("items"), lambda x: x["tok"]))
    if portable_hash:
        h = F.conv(F.substring(F.md5(run_text), 1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64(run_text)
    rep = F.element_at(
        spark_reps, (F.pmod(h, F.size(spark_reps)) + 1).cast("int")
    )
    rep_toks = F.split(rep, r"\s+")
    rep_tags = F.transform(
        rep_toks,
        lambda x, i: F.when(i == 0, F.lit(f"B-{target}")).otherwise(F.lit(f"I-{target}")),
    )
    segs = segs.select(
        "row_id", "pos",
        F.when(F.col("is_target") == 1, rep_toks).otherwise(
            F.transform(F.array_sort("items"), lambda x: x["tok"])
        ).alias("seg_toks"),
        F.when(F.col("is_target") == 1, rep_tags).otherwise(
            F.transform(F.array_sort("items"), lambda x: x["tag"])
        ).alias("seg_tags"),
    )
    rebuilt = segs.groupBy("row_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg_toks"))),
                lambda x: x["seg_toks"],
            )
        ).alias("aug_tokens"),
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg_tags"))),
                lambda x: x["seg_tags"],
            )
        ).alias("aug_tags"),
    )
    return df.select(F.col(id_col).alias("row_id"), tokens_col, tags_col).join(
        rebuilt, "row_id", "left"
    )
