"""J5 + A11 + P8: NEAT combiner semantics as order-free relational ops.

Reference (/root/reference/sweet/neat_extractors.py:224-302):
* compute_combined (:224-243): dict-extractor and rule-extractor entity sets
  keyed by (text, begin_offset) (Entity.__eq__/__hash__,
  neat_base_classes.py:48-55); both fired -> base_conf = 0.5·dict + 0.5·rule;
  one fired -> base_conf = 0.5·conf.
* per-entity merge (:267-274): the same (text, begin) appearing k times
  multiplies base_conf and fill_mask ratios across occurrences (note: with
  (text, begin) keys duplicates are rare; the quirk matters when extractors
  emit repeats).
* confidence = 0.5·base_conf + 0.5·fill_mask_conf (:282); threshold filter
  (:283-288): conf >= thr, or the band [thr, thr+add_bound) when upper_bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ["row_id", "surface", "begin"]


def combine_dict_rule(dict_mentions: DataFrame, rule_mentions: DataFrame) -> DataFrame:
    """Full outer join on (row_id, surface, begin) — exact, order-free
    replacement for the reference's Python set algebra (J5)."""
    d = dict_mentions.groupBy(*KEY).agg(F.first("base_conf").alias("dict_conf"),
                                        F.first("end").alias("d_end"))
    r = rule_mentions.groupBy(*KEY).agg(F.first("base_conf").alias("rule_conf"),
                                        F.first("end").alias("r_end"))
    j = d.join(r, KEY, "full_outer")
    both = F.col("dict_conf").isNotNull() & F.col("rule_conf").isNotNull()
    base = F.when(both, 0.5 * F.col("dict_conf") + 0.5 * F.col("rule_conf")).otherwise(
        0.5 * F.coalesce("dict_conf", "rule_conf")
    )
    return j.select(
        *KEY,
        F.coalesce("d_end", "r_end").alias("end"),
        base.alias("base_conf"),
    )


def product_merge(mentions: DataFrame, keys: list[str] = KEY) -> DataFrame:
    """A11: multiply base_conf / fill_mask_conf across duplicate occurrences.
    Spark has no product aggregate; exp(sum(log)) with zero/sign guards
    (confidences are in [0,1], so only the zero guard is needed)."""
    has_zero = F.max(F.when(F.col("base_conf") == 0, 1).otherwise(0))
    log_sum = F.sum(F.log(F.when(F.col("base_conf") > 0, F.col("base_conf"))))
    fm_zero = F.max(F.when(F.col("fill_mask_conf") == 0, 1).otherwise(0))
    fm_log = F.sum(F.log(F.when(F.col("fill_mask_conf") > 0, F.col("fill_mask_conf"))))
    return (
        mentions.groupBy(*keys)
        .agg(
            F.when(has_zero == 1, F.lit(0.0)).otherwise(F.exp(log_sum)).alias("base_conf"),
            F.when(fm_zero == 1, F.lit(0.0)).otherwise(F.exp(fm_log)).alias("fill_mask_conf"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
    )


def confidence_filter(mentions: DataFrame, threshold: float,
                      add_bound: float = 0.05, upper_bound: bool = False) -> DataFrame:
    """P8 + final confidence mix (neat_extractors.py:282-288)."""
    conf = 0.5 * F.col("base_conf") + 0.5 * F.coalesce("fill_mask_conf", F.lit(0.0))
    out = mentions.withColumn("confidence", conf)
    if upper_bound:
        return out.where(
            (F.col("confidence") >= threshold)
            & (F.col("confidence") < threshold + add_bound)
        )
    return out.where(F.col("confidence") >= threshold)
