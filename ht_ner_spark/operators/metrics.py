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


def partial_f1_counts(df: DataFrame, truth_col: str, pred_col: str) -> DataFrame:
    """Partial (substring-tolerant) P/R counts — semantics of
    /root/reference/src/neat_metrics.py:94-123 ``Partial_F1``:

    * pred entities are split into WORDS and lower-cased (set);
    * truth entities kept as-is (set; NOT lower-cased — reference quirk);
    * a pred word is a TP iff it is a substring of, or contains, ANY truth
      entity; else FP; a truth entity with no such pred word is an FN.

    Input columns are array<string>; output per-row (tp, fp, fn) ready for
    a global sum (one hash agg)."""
    # python str.split() drops empty fragments — filter after the regex split
    pred_words = F.array_distinct(
        F.filter(
            F.flatten(
                F.transform(F.col(pred_col), lambda e: F.split(F.lower(e), r"\s+"))
            ),
            lambda x: x != "",
        )
    )
    truth = F.array_distinct(F.col(truth_col))
    matches = lambda i, j: (F.instr(j, i) > 0) | (F.instr(i, j) > 0)  # noqa: E731
    tp = F.size(F.filter(pred_words, lambda i: F.exists(truth, lambda j: matches(i, j))))
    fp = F.size(pred_words) - tp
    fn = F.size(
        F.filter(truth, lambda i: ~F.exists(pred_words, lambda j: matches(i, j)))
    )
    return df.select(
        "*",
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
    )


def ad_level_counts(df: DataFrame, truth_col: str, pred_col: str,
                    split_into_words: bool = True) -> DataFrame:
    """Ad-level (per-row) IoU>=0.5 classification — semantics of
    /root/reference/src/neat_metrics.py:136-161 ``ad_level`` with
    SPLIT_INTO_WORDS=True (:7): pred split into lower words, truth lowered;
    FN when truth nonempty and pred empty; TN when both empty;
    else TP iff |∩|/|∪| >= 0.5 on the sets, else FP."""
    if split_into_words:
        pred = F.array_distinct(
            F.filter(
                F.flatten(
                    F.transform(F.col(pred_col), lambda e: F.split(F.lower(e), r"\s+"))
                ),
                lambda x: x != "",
            )
        )
        truth = F.array_distinct(F.transform(F.col(truth_col), F.lower))
    else:
        pred = F.array_distinct(F.transform(F.col(pred_col), lambda e: F.trim(F.lower(e))))
        truth = F.array_distinct(F.transform(F.col(truth_col), lambda e: F.trim(F.lower(e))))
    inter = F.size(F.array_intersect(pred, truth))
    union = F.size(F.array_union(pred, truth))
    iou = inter / union
    tp = F.when((F.size(truth) > 0) | (F.size(pred) > 0),
                F.when((F.size(truth) > 0) & (F.size(pred) == 0), 0)
                .when(iou >= 0.5, 1).otherwise(0)).otherwise(0)
    fp = F.when((F.size(truth) > 0) & (F.size(pred) == 0), 0).when(
        ((F.size(truth) > 0) | (F.size(pred) > 0)) & (iou < 0.5), 1
    ).otherwise(0)
    fn = F.when((F.size(truth) > 0) & (F.size(pred) == 0), 1).otherwise(0)
    return df.select(
        "*",
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
    )


def cohens_kappa(df, a_col: str, b_col: str):
    """ONE-row inter-labeler agreement between two boolean label columns:
    (n, a_pos, b_pos, both_pos, po, pe, kappa) — Cohen's kappa, the standard
    weak-supervision diagnostic for whether two labeling functions agree
    beyond chance (Snorkel-style LF analysis; the reference eyeballs its LF
    overlap via the votes matrix, src/neat_aggregation.py — this is the
    quantified version).

    100 TB shape: a single full-scan aggregation (4 conditional counts,
    map-side combined into one partial row per partition); po/pe/kappa are
    derived driver-free from the INTEGER counts, so the floats are
    order-of-summation-proof by construction — every engine divides the
    same two integers."""
    from pyspark.sql import functions as F

    a, b = F.col(a_col), F.col(b_col)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a.cast("long")).alias("a_pos"),
        F.sum(b.cast("long")).alias("b_pos"),
        F.sum((a & b).cast("long")).alias("both_pos"),
    )
    n = F.col("n").cast("double")
    tn = F.col("n") - F.col("a_pos") - F.col("b_pos") + F.col("both_pos")
    po = (F.col("both_pos") + tn) / n
    # products as doubles BEFORE multiplying: long*long overflows at
    # ~3e9 tokens per side — real corpus scale, not a corner case
    a_d, b_d = F.col("a_pos").cast("double"), F.col("b_pos").cast("double")
    pe = (a_d * b_d + (n - a_d) * (n - b_d)) / (n * n)
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("a_pos").cast("long").alias("a_pos"),
        F.col("b_pos").cast("long").alias("b_pos"),
        F.col("both_pos").cast("long").alias("both_pos"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        # degenerate input (both labelers constant, e.g. an empty frame or
        # one where a and b are all-true/all-false) gives pe == 1 and kappa
        # is undefined — emit NULL explicitly rather than divide by zero;
        # the oracle SQL carries the same guard (ADVICE r3).
        F.when(pe < 1, F.round((po - pe) / (1 - pe), 6))
        .otherwise(F.lit(None).cast("double")).alias("kappa"),
    )


def pairwise_cluster_metrics(assign: DataFrame,
                             pred_col: str = "component_id",
                             gold_col: str = "gold") -> DataFrame:
    """Pairwise precision/recall/F1 of a predicted clustering against gold
    labels — the standard entity-resolution evaluation (Menestrina 2010):
    a pair of items counts as predicted-positive if they share a predicted
    cluster, gold-positive if they share a gold label; P/R/F1 follow.  One
    row: (n_items, n_pred_clusters, n_gold_clusters, tp_pairs, pred_pairs,
    gold_pairs, precision, recall, f1).

    Shape at scale: NEVER materializes pairs — tp_pairs is sum over the
    (pred, gold) contingency cells of C(n,2), pred/gold_pairs likewise over
    the marginal cluster sizes, so the cost is three hash aggregates over
    the assignment frame (the contingency one subsumes a marginal via a
    second small re-agg).  Hub clusters are single aggregate cells, not
    quadratic blow-ups."""
    def npairs(c):
        # c*(c-1) is even, so a right shift is the exact C(c,2) — dividing
        # by 2 in double would silently round once the pair count passes
        # 2^53 (a 10^8-member hub cluster is 5*10^15 pairs; real at 100 TB)
        return F.shiftright(F.sum(c * (c - 1)), 1)

    cont = (assign.groupBy(pred_col, gold_col)
            .agg(F.count("*").alias("n"))).localCheckpoint()
    tp = cont.agg(npairs(F.col("n")).alias("tp_pairs"),
                  F.sum("n").alias("n_items"))
    pred = (cont.groupBy(pred_col).agg(F.sum("n").alias("n"))
            .agg(npairs(F.col("n")).alias("pred_pairs"),
                 F.count("*").alias("n_pred_clusters")))
    gold = (cont.groupBy(gold_col).agg(F.sum("n").alias("n"))
            .agg(npairs(F.col("n")).alias("gold_pairs"),
                 F.count("*").alias("n_gold_clusters")))
    p = F.when(F.col("pred_pairs") > 0,
               F.col("tp_pairs") / F.col("pred_pairs"))
    r = F.when(F.col("gold_pairs") > 0,
               F.col("tp_pairs") / F.col("gold_pairs"))
    return (tp.join(F.broadcast(pred)).join(F.broadcast(gold))
            .select(
                F.col("n_items").cast("long").alias("n_items"),
                F.col("n_pred_clusters").cast("long").alias("n_pred_clusters"),
                F.col("n_gold_clusters").cast("long").alias("n_gold_clusters"),
                F.col("tp_pairs").cast("long").alias("tp_pairs"),
                F.col("pred_pairs").cast("long").alias("pred_pairs"),
                F.col("gold_pairs").cast("long").alias("gold_pairs"),
                F.round(p, 6).alias("precision"),
                F.round(r, 6).alias("recall"),
                F.when((F.col("pred_pairs") > 0) & (F.col("gold_pairs") > 0)
                       & (p + r > 0),
                       F.round(2 * p * r / (p + r), 6)).alias("f1")))
