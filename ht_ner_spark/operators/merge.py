"""W2: adjacent-subtoken merge (wordpiece -> word), gaps-and-islands.

Reference (/root/reference/src/finetune_evaluation_HT.py:109-122 and
src/finetune_evaluation.py:129-139): model outputs sorted by char start; a
fragment is merged into the previous one when ``x["start"] == prev["end"]``;
merged word = concatenation, merged span = (min start, max end), score of the
first fragment kept.

Spark: Window.partitionBy(row_id).orderBy(start) -> new_group flag when
start != lag(end) -> running sum = island id -> groupBy island. One shuffle
keyed by row_id (token streams are per-row, so the window partitions are
balanced)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_adjacent(fragments: DataFrame,
                   row_col: str = "row_id",
                   start_col: str = "start",
                   end_col: str = "end",
                   word_col: str = "word",
                   score_col: str | None = "score") -> DataFrame:
    w = Window.partitionBy(row_col).orderBy(start_col, end_col)
    flagged = fragments.withColumn(
        "_new",
        F.when(
            F.col(start_col) == F.lag(end_col).over(w), F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn("_grp", F.sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))
    aggs = [
        F.min(start_col).alias(start_col),
        F.max(end_col).alias(end_col),
        F.concat_ws("", F.array_sort(
            F.collect_list(F.struct(F.col(start_col).alias("s"),
                                    F.col(word_col).alias("w")))
        ).getField("w")).alias(word_col),
    ]
    if score_col:
        aggs.append(F.min_by(score_col, F.col(start_col)).alias(score_col))
    return (
        flagged.groupBy(row_col, "_grp").agg(*aggs).drop("_grp")
    )
