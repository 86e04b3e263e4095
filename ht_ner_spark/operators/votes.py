"""Long-format LF votes (row_id, pos, lf_name, label, weight) — the Spark
form of the reference's ``doc.spans`` dict (/root/reference/sweet/run_sweet.py:67-70).

Includes the J2 span re-projection quirk: every span-producing LF
(rule/dictionary/disambiguation/spacy annotators,
/root/reference/sweet/labeling_functions.py:27-54,123-130) re-labels EVERY
token whose exact text equals an extracted surface — losing position
specificity. Multi-token surfaces therefore never vote (no single token
equals them) — quirk preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import preprocess, string_to_entities


def project_mentions_to_votes(token_view: DataFrame, mentions: DataFrame,
                              weight: float = 1.0) -> DataFrame:
    """J2: for each (row_id, lf_name), label every token position whose exact
    token text equals any extracted surface of that LF in that row.

    Shape: distinct per-row surface set per LF (small) joined back to the
    exploded token view on (row_id, tok == surface) — an equi-join on
    (row_id, text), shuffle-partitioned by row_id on both sides so it
    co-partitions with every other per-row operator.
    """
    surfaces = mentions.select("row_id", "lf_name", F.col("surface").alias("tok_eq")).distinct()
    return (
        token_view.join(
            surfaces,
            (token_view["row_id"] == surfaces["row_id"])
            & (token_view["tok"] == surfaces["tok_eq"]),
            "inner",
        )
        .select(
            token_view["row_id"],
            F.col("pos").cast("int").alias("pos"),
            "lf_name",
            F.lit("PERSON_NAME").alias("label"),
            F.lit(weight).alias("weight"),
            token_view["tok"],
        )
    )


def melt_lf_matrix(matrix: DataFrame, id_col: str = "row_id") -> DataFrame:
    """S9: wide weak-label matrix (one column per fine-tuned model, values
    '|'-separated, 'N' = none — sweet/create_lfs.py:36-56) -> long
    (row_id, lf_name, surfaces:array<string>).

    Normalization per reference :44-54: fillna('N'); 'N' -> []; else
    replace(' ', '|'), split '|', preprocess().lower() each, distinct.
    """
    lf_cols = [c for c in matrix.columns if c != id_col]
    stacked = matrix.unpivot(
        ids=[id_col], values=lf_cols, variableColumnName="lf_name",
        valueColumnName="raw",
    )
    raw = F.coalesce(F.col("raw"), F.lit("N"))
    surfaces = F.when(raw == "N", F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.split(F.regexp_replace(raw, " ", "|"), r"\|"),
                lambda x: F.lower(preprocess(x)),
            )
        )
    )
    return stacked.select(id_col, "lf_name", surfaces.alias("surfaces"))


def model_result_votes(token_view: DataFrame, lf_long: DataFrame,
                       anti: bool = True, weight: float = 1.0) -> DataFrame:
    """J4 NERModelResultDetector (labeling_functions.py:102-115): token votes
    where lower(tok.text) ∈ the row's model-result surface set; label NOT_NAME
    when anti else PERSON_NAME. Empty result lists produce no votes
    (reference `if self.model_result == []: return`)."""
    label = "NOT_NAME" if anti else "PERSON_NAME"
    joined = token_view.join(lf_long, "row_id", "inner")
    return (
        joined.where(F.array_contains(F.col("surfaces"), F.lower(F.col("tok"))))
        .select(
            "row_id",
            F.col("pos").cast("int").alias("pos"),
            F.concat(F.col("lf_name"), F.lit("_model")).alias("lf_name"),
            F.lit(label).alias("label"),
            F.lit(weight).alias("weight"),
            "tok",
        )
    )


def mentions_to_votes_direct(mentions: DataFrame, weight: float = 1.0) -> DataFrame:
    """Position-faithful vote projection (for LFs that vote at their own span:
    caps detectors + frequency already emit per-position votes; single-token
    mentions map begin -> pos)."""
    return mentions.where(F.col("end") == F.col("begin") + 1).select(
        "row_id",
        F.col("begin").alias("pos"),
        "lf_name",
        "label",
        F.lit(weight).alias("weight"),
        F.col("surface").alias("tok"),
    )


def parse_entity_column(df: DataFrame, col: str, out: str = "entities") -> DataFrame:
    """Eval-side '|'-string -> normalized array (T5/P2/P3)."""
    return df.withColumn(out, string_to_entities(col))
