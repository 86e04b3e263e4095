"""A4/A5: entity- and token-level micro P/R/F1 — faithful port of
/root/reference/src/metrics.py::f1 (:7-167) as one Spark aggregation.

Semantics preserved exactly:
* normalization (:28-45): fillna('') , ^N$ -> '', lower, split '|', strip,
  drop empty strings;
* ignore_duplicates=True (:64-67): per-row SET intersection/differences;
* ignore_duplicates=False (:69-82): multiset counting — each gt occurrence in
  the pred SET counts a TP, each pred occurrence missing from the gt SET a FP;
* token level (:85-116): entities re-tokenized with
  RegexpTokenizer(r"\\w+|\\$[\\d\\.]+|\\S+") (:5), then same set logic;
* epsilon = 1e-7 added to every counter (:49-56), so
  P = (tp+eps)/(tp+eps + fp+eps) exactly like the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import TOKEN_PATTERN, string_to_entities

EPSILON = 1e-7


def _tokens_of_entities(arr_col):
    """flatten(transform(ents, e -> regexp_extract_all(e, TOKEN_PATTERN)))"""
    return F.flatten(
        F.transform(arr_col, lambda e: F.regexp_extract_all(e, F.lit(TOKEN_PATTERN), 0))
    )


def f1_counts(df: DataFrame, truth_col: str, pred_col: str,
              ignore_duplicates: bool = True,
              parse_strings: bool = True) -> DataFrame:
    """One-row DataFrame with entity_{tp,fp,fn} and token_{tp,fp,fn} sums.

    truth_col/pred_col are '|'-encoded strings (parse_strings=True) or
    array<string> columns already normalized."""
    t = string_to_entities(truth_col) if parse_strings else F.col(truth_col)
    p = string_to_entities(pred_col) if parse_strings else F.col(pred_col)
    base = df.select(
        F.array_distinct(t).alias("t_set"),
        F.array_distinct(p).alias("p_set"),
        t.alias("t_list"),
        p.alias("p_list"),
    )

    def counts(prefix: str, t_set, p_set, t_list, p_list):
        if ignore_duplicates:
            tp = F.size(F.array_intersect(p_set, t_set))
            fp = F.size(F.array_except(p_set, t_set))
            fn = F.size(F.array_except(t_set, p_set))
        else:
            tp = F.size(F.filter(t_list, lambda e: F.array_contains(p_set, e)))
            fn = F.size(F.filter(t_list, lambda e: ~F.array_contains(p_set, e)))
            fp = F.size(F.filter(p_list, lambda e: ~F.array_contains(t_set, e)))
        return [
            F.sum(tp).alias(f"{prefix}_tp"),
            F.sum(fp).alias(f"{prefix}_fp"),
            F.sum(fn).alias(f"{prefix}_fn"),
        ]

    tok_t = _tokens_of_entities(F.col("t_list"))
    tok_p = _tokens_of_entities(F.col("p_list"))
    staged = base.select(
        "t_set", "p_set", "t_list", "p_list",
        F.array_distinct(tok_t).alias("tt_set"),
        F.array_distinct(tok_p).alias("tp_set2"),
        tok_t.alias("tt_list"),
        tok_p.alias("tp_list2"),
    )
    return staged.agg(
        *counts("entity", F.col("t_set"), F.col("p_set"), F.col("t_list"), F.col("p_list")),
        *counts("token", F.col("tt_set"), F.col("tp_set2"), F.col("tt_list"), F.col("tp_list2")),
    )


def f1_scores(df: DataFrame, truth_col: str, pred_col: str,
              ignore_duplicates: bool = True,
              parse_strings: bool = True,
              epsilon: float = EPSILON) -> dict[str, float]:
    """Driver-side P/R/F1 arithmetic on the single aggregated row —
    identical formulas to metrics.py:119-152."""
    row = f1_counts(df, truth_col, pred_col, ignore_duplicates, parse_strings).collect()[0]
    out: dict[str, float] = {}
    for lvl in ("entity", "token"):
        tp = row[f"{lvl}_tp"] + epsilon
        fp = row[f"{lvl}_fp"] + epsilon
        fn = row[f"{lvl}_fn"] + epsilon
        prec = tp / (tp + fp)
        rec = tp / (tp + fn)
        out[f"{lvl}_precision"] = prec
        out[f"{lvl}_recall"] = rec
        out[f"{lvl}_f1"] = 2 * prec * rec / (prec + rec)
    return out
