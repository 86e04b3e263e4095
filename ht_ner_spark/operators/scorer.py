"""Stage-1 scoring surface: fill-mask disambiguation + link scoring (M2/M5).

Reference semantics (/root/reference/sweet/neat_disambiguation.py):

* W1: context window = ±5 whitespace-split tokens around the FIRST occurrence
  of the word in the lower-cased text (`context_list.index(word.lower())`,
  :88-95 — J6: first occurrence, NOT the mention position; missing -> ratio 0);
  the word's slot is replaced with ``<mask>`` (:96-98).
* M2: a RoBERTa fill-mask model proposes top_k=40 fills for the mask; the
  score is the fraction of fills found in the name gazetteer, excluding the
  original word (:59-70); quirk A10a: if the original word IS one of its own
  top-k fills the ratio is REPLACED by -2 (:101-104 overwrites
  info_dict['ratio'] = -2). Deliberate deviation kept (SURVEY §7.0): the
  reference masks by substring-replacing the FIRST occurrence of the word
  (which can hit mid-word, e.g. 'art' inside 'part'); context_window masks
  the exact token slot instead — token-exact masking is strictly more
  faithful to "mask the mention" and is shared by engine AND oracle.
* A10b: the reference repeats the identical deterministic call num_runs=10
  times and averages (:43-48,101-104) — collapsed to 1 run here (semantic
  no-op, 10x saving; documented deviation, SURVEY §2.4 A10).
* Combination: confidence = 0.5*base_conf + 0.5*fill_mask_conf
  (neat_extractors.py:282) — operators/combine.py.

Scorer implementations (SURVEY §7.0: model deps absent in sandbox):

* ``HashScorer`` — deterministic, *relational-expressible*: the "model" is
  md5 over (lower(surface), masked window) — so the DuckDB oracle reproduces
  it bit-for-bit and the whole scoring path is correctness-gated. The -2
  penalty fires on a deterministic hash bucket, mirroring the quirk's shape.
* ``HFScorer`` — the real transformer path: batched fill-mask inside
  mapInPandas with a per-executor model cache and GPU device pick. Gated
  behind an import-try; raises with a clear message when transformers is
  absent. The Spark plumbing (schema, batching, window build) is identical
  for both scorers — swapping is config, not code.
"""

from __future__ import annotations

from typing import Iterator, Protocol

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MASK = "<mask>"
PENALTY = -2.0  # neat_disambiguation.py:68-69 quirk
TOP_K = 40      # neat_disambiguation.py:10


# ---------------------------------------------------------------------------
# W1 + J6: context-window construction (pure relational — no UDF)

def context_window(text: Column, word: Column, radius: int = 5) -> Column:
    """masked ±radius whitespace-token window around the FIRST occurrence of
    ``word`` in lower(text); NULL when the word does not occur (J6 missing ->
    caller scores 0, neat_disambiguation.py:93-95)."""
    toks = F.split(F.lower(text), " ")
    # 1-based first occurrence; 0 = missing
    pos = F.array_position(toks, F.lower(word))
    n = F.size(toks)
    # python slice [max(0,i-5):min(N,i+5)] with i 0-based == 1-based start
    # max(1, pos-5), end exclusive min(n+1, pos+5) -> length end-start
    start = F.greatest(F.lit(1), pos - radius)
    end = F.least(n + 1, pos + radius)
    window = F.slice(toks, start, end - start)
    # mask the word's slot: 1-based index within the window = pos - start + 1
    mask_idx = pos - start + 1
    masked = F.transform(
        window, lambda x, i: F.when(i + 1 == mask_idx, F.lit(MASK)).otherwise(x)
    )
    return F.when(pos == 0, F.lit(None)).otherwise(F.concat_ws(" ", masked))


def with_context_windows(mentions: DataFrame, corpus: DataFrame,
                         radius: int = 5) -> DataFrame:
    """mentions ⋈ corpus(content) -> + ``context`` column (W1). The join is
    on row_id — co-partitioned with every other per-row operator."""
    return (
        mentions.join(corpus.select("row_id", "content"), "row_id", "inner")
        .withColumn("context", context_window(F.col("content"), F.col("surface"), radius))
        .drop("content")
    )


# ---------------------------------------------------------------------------
# Scorer protocol

class Scorer(Protocol):
    def score_batch(self, surfaces: pd.Series, contexts: pd.Series) -> pd.Series:
        """-> fill_mask_conf per (surface, masked context); missing context
        scores 0.0; the A10 -2 penalty is part of the score."""
        ...


class HashScorer:
    """Deterministic sandbox scorer; md5-based so DuckDB can reproduce it.

    score = (int(md5(lower(surface) || ':' || context)[:6], 16) % 1000)/1000
    penalty: the score is REPLACED by -2 when
    int(md5('p:' || lower(surface))[:4], 16) % 7 == 0 — mirroring the
    reference's A10 quirk, which OVERWRITES the ratio with -2 when the word
    fills itself (neat_disambiguation.py:101-104, info_dict['ratio'] = -2),
    it does not add the penalty.
    context NULL -> 0.0 (J6 missing-word rule).
    """

    def score_batch(self, surfaces: pd.Series, contexts: pd.Series) -> pd.Series:
        import hashlib

        def one(surface: str, ctx) -> float:
            if ctx is None or (isinstance(ctx, float) and pd.isna(ctx)):
                return 0.0
            s = (surface or "").lower()
            p = int(hashlib.md5(f"p:{s}".encode()).hexdigest()[:4], 16)
            if p % 7 == 0:
                return PENALTY
            h = int(hashlib.md5(f"{s}:{ctx}".encode()).hexdigest()[:6], 16)
            return (h % 1000) / 1000.0

        return pd.Series([one(s, c) for s, c in zip(surfaces, contexts)],
                         dtype="float64")

    @staticmethod
    def spark_expr(surface: Column, context: Column) -> Column:
        """The SAME score as a JVM-side expression (whole-stage codegen, no
        Python) — used by the engine's relational path AND mirrored by the
        DuckDB oracle SQL."""
        s = F.lower(surface)
        h = F.conv(F.substring(F.md5(F.concat_ws(":", s, context)), 1, 6), 16, 10
                   ).cast("long")
        p = F.conv(F.substring(F.md5(F.concat(F.lit("p:"), s)), 1, 4), 16, 10
                   ).cast("long")
        # A10: penalty REPLACES the score (reference overwrites ratio with -2)
        score = F.when(p % 7 == 0, F.lit(PENALTY)).otherwise((h % 1000) / F.lit(1000.0))
        return F.when(context.isNull(), F.lit(0.0)).otherwise(score)

    @staticmethod
    def sql_expr(surface: str, context: str) -> str:
        """DuckDB rendering of the identical score."""
        s = f"lower({surface})"
        h = f"(('0x' || substr(md5({s} || ':' || {context}), 1, 6))::BIGINT)"
        p = f"(('0x' || substr(md5('p:' || {s}), 1, 4))::BIGINT)"
        return (f"CASE WHEN {context} IS NULL THEN 0.0 "
                f"WHEN {p} % 7 = 0 THEN {PENALTY} "
                f"ELSE ({h} % 1000) / 1000.0 END")


class HFScorer:
    """Real fill-mask scoring (M2) — per-executor cached transformer, GPU
    device pick, byte-bounded batches. Importable only when transformers +
    torch are installed (not in this sandbox; SURVEY §7.0)."""

    def __init__(self, model_name: str = "roberta-base", top_k: int = TOP_K,
                 gazetteer: dict[str, float] | None = None):
        try:
            import torch  # noqa: F401
            import transformers  # noqa: F401
        except ImportError as e:  # pragma: no cover - sandbox has no torch
            raise NotImplementedError(
                "HFScorer needs transformers+torch; use HashScorer in "
                "environments without them (config swap, same plumbing)"
            ) from e
        self.model_name = model_name
        self.top_k = top_k
        self.gazetteer = {k.lower() for k in (gazetteer or {})}
        self._pipe = None

    def _pipeline(self):  # pragma: no cover - needs torch
        if self._pipe is None:
            import torch
            from transformers import pipeline

            device = 0 if torch.cuda.is_available() else -1
            self._pipe = pipeline("fill-mask", model=self.model_name,
                                  top_k=self.top_k, device=device)
        return self._pipe

    def score_batch(self, surfaces, contexts):  # pragma: no cover - needs torch
        pipe = self._pipeline()
        out = []
        for surface, ctx in zip(surfaces, contexts):
            if ctx is None:
                out.append(0.0)
                continue
            fills = pipe(ctx)
            toks = [f["token_str"].strip("Ġ▁ ").lower() for f in fills]
            # ratio of fills found in gazetteer, excluding the original word
            # (neat_disambiguation.py:59-70); the ratio is REPLACED by -2
            # when the word fills itself (neat_disambiguation.py:101-104
            # overwrites info_dict['ratio'] = -2, it does not add)
            hits = sum(1 for t in toks if t in self.gazetteer and t != surface.lower())
            ratio = hits / max(len(toks), 1)
            if surface.lower() in toks:
                ratio = PENALTY
            out.append(ratio)
        return pd.Series(out, dtype="float64")


# ---------------------------------------------------------------------------
# M2 driver: score mentions (relational fast path for HashScorer, Arrow UDF
# for model scorers)

def score_mentions(mentions: DataFrame, corpus: DataFrame,
                   scorer: Scorer | None = None, radius: int = 5) -> DataFrame:
    """mentions -> + fill_mask_conf (+ confidence = 0.5*base + 0.5*fill,
    neat_extractors.py:282). HashScorer (default) stays entirely JVM-side;
    any other scorer runs via an Arrow-batched pandas iterator."""
    ctx = with_context_windows(mentions, corpus, radius)
    if scorer is None or isinstance(scorer, HashScorer):
        scored = ctx.withColumn(
            "fill_mask_conf",
            HashScorer.spark_expr(F.col("surface"), F.col("context")),
        )
    else:
        cols = ctx.columns
        schema = ", ".join(
            [f"{f.name} {f.dataType.simpleString()}"
             for f in ctx.schema.fields] + ["fill_mask_conf double"]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["fill_mask_conf"] = scorer.score_batch(
                    pdf["surface"], pdf["context"]
                )
                yield pdf

        scored = ctx.mapInPandas(run, schema)
        scored = scored.select(*cols, "fill_mask_conf")
    return scored.withColumn(
        "confidence",
        0.5 * F.col("base_conf") + 0.5 * F.col("fill_mask_conf"),
    )


def threshold_filter(mentions: DataFrame, thr: float,
                     add_bound: float | None = None) -> DataFrame:
    """P8: confidence >= thr; with add_bound, the band [thr, thr+add_bound)
    (neat_extractors.py:283-288)."""
    if add_bound is None:
        return mentions.where(F.col("confidence") >= thr)
    return mentions.where(
        (F.col("confidence") >= thr) & (F.col("confidence") < thr + add_bound)
    )
