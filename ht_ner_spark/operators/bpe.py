"""BPE vocabulary induction — tokenizer training as a data-pipeline op.

Classic byte-pair-encoding training (Sennrich et al. 2016): start from
characters, repeatedly merge the corpus-wide most frequent adjacent symbol
pair. Deterministic: frequencies are integer sums and ties break (left asc,
right asc), so any engine learns the identical merge table.

100 TB shape: BPE training NEVER iterates over the corpus — it iterates
over the WORD-FREQUENCY DICTIONARY (one corpus scan + one (word) shuffle to
build; vocab is millions of rows where the corpus is trillions). Each merge
round is two vocab-sized aggregations plus a 1-row broadcast; the merge
itself is a row-side array fold (leftmost non-overlapping, the reference
greedy semantics). The corpus is touched exactly once.

The contract oracle replays the identical rounds in DuckDB using the
doubled-space string trick: ' a  b ' -> ' ab ' under plain (non-regex)
replace() is exactly the leftmost non-overlapping fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BPE_MERGES = 5


def _merge_adjacent(syms: Column, a: Column, b: Column) -> Column:
    """Fold the symbol array left-to-right, merging adjacent (a, b) -> a||b
    leftmost-first, non-overlapping (a freshly merged token never re-merges
    within the round — its value differs from `a` by construction)."""
    merged = F.concat(a, b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(df: DataFrame, merges: int = BPE_MERGES,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(merge_rank, lhs, rhs, merged, pair_freq): the learned merge table
    after ``merges`` rounds over the corpus word-frequency dictionary.
    pair_freq is the corpus-wide (frequency-weighted) count of the winning
    adjacent pair at the time it was merged."""
    words = (
        df.select(F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                    r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = words.select(
        "freq",
        # (?=.) forbids the end-of-string split point: Spark's split keeps
        # trailing empties (limit=-1), which would plant a phantom '' symbol.
        F.split(F.col("word"), "(?!^)(?=.)").alias("syms"),
    ).localCheckpoint()  # the corpus is out of the loop from here on

    merge_rows = []
    for r in range(1, merges + 1):
        pairs = vocab.select(
            "freq",
            F.explode(
                F.filter(
                    F.transform(
                        F.col("syms"),
                        lambda x, i: F.when(
                            i + 2 <= F.size(F.col("syms")),
                            F.struct(x.alias("a"),
                                     F.element_at(F.col("syms"), i + 2).alias("b")),
                        ),
                    ),
                    lambda s: s.isNotNull(),
                )
            ).alias("p"),
        )
        top1 = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("pair_freq"))
            .orderBy(F.desc("pair_freq"), F.asc("a"), F.asc("b"))
            .limit(1)
            .localCheckpoint()  # 1 row; pins the round's winner for reuse
        )
        merge_rows.append(top1.select(
            F.lit(r).cast("long").alias("merge_rank"),
            F.col("a").alias("lhs"), F.col("b").alias("rhs"),
            F.concat("a", "b").alias("merged"),
            F.col("pair_freq").cast("long").alias("pair_freq"),
        ))
        vocab = (
            vocab.join(F.broadcast(top1))
            .select("freq",
                    _merge_adjacent(F.col("syms"), F.col("a"), F.col("b"))
                    .alias("syms"))
            .localCheckpoint()  # vocab-sized; keeps round lineage flat
        )

    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): tokenize the corpus with a learned
    BPE merge table (the inference half of train_bpe; ``merges`` is the
    ordered [(lhs, rhs), ...] list, driver-side — merge tables are KBs).

    100 TB shape: the merge folds run over the DISTINCT-WORD VOCAB, never
    the corpus — encode the vocab once into (word, n_bpe) and join the
    exploded corpus words against it (one word-keyed shuffle that AQE
    broadcasts when the vocab is small); per-doc counts fold out of one
    doc-keyed agg. This is how production BPE application works too: the
    tokenizer memoizes per word, the corpus pays a dictionary lookup."""
    words = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                    r"\s+")).alias("word"))
        .where(F.col("word") != "")
    )
    syms = F.split(F.col("word"), "(?!^)(?=.)")
    for a, b in merges:
        syms = _merge_adjacent(syms, F.lit(a), F.lit(b))
    vocab = words.select("word").distinct().select(
        "word", F.size(syms).alias("n_bpe")
    )
    return (
        words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_words"), F.sum("n_bpe").alias("n_bpe"))
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_bpe").cast("long").alias("n_bpe_tokens"),
        )
    )
