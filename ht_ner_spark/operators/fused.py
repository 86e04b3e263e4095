"""Fused stage-1 labeler: every LF in ONE Arrow mapInPandas corpus pass.

The reference runs one full corpus pass per labeling function
(/root/reference/sweet/run_sweet.py:52-55 — an LF loop inside a doc loop,
each LF re-matching over the doc) and its composed Spark translation still
scans the corpus once per LF family (gazetteer, rules, caps) plus once per
vote projection.  The north_star instead prescribes mention detection
"gazetteer trie + regex labelers fused with batched transformer scoring
inside a GPU-aware mapInPandas loop": a single pass that tokenizes each row
once and emits every mention AND every LF vote for it.

At 10^12-file scale this is the difference between ~8 corpus scans + 3
shuffles and exactly ONE scan with ZERO shuffles (the output is written
straight to the stage-1 table; the only remaining stage-1 shuffle is the
corpus-global frequency aggregation, which is unavoidable — it is the
reference's own two-pass barrier, sweet/create_lfs.py:17-34).

Semantics are bit-identical to the composed relational operators
(gazetteer.match_trie/match_relational, rules.rule_mentions,
rules.all_caps_mentions, rules.name_case_mentions, votes.*,
antirules.frequency_votes) — enforced by tests/test_fused.py which diffs the
two paths row-set-wise on the synthetic corpus.

Frequency antirules inside the fused pass: the ranked common-word list is
collected and broadcast when its top-k fits ``max_broadcast_vocab``
(reference vocabularies are 10k-30k entries); above that the caller falls
back to the relational broadcast-join form — the adaptive path is chosen in
pipeline.stage1_mentions.

Two implementations share this contract (PipelineConfig.fused_impl):
'vector' (default) is the columnar batch labeler in operators/fused_vec.py
(per-unique predicate computation + numpy gather + columnar emission);
'loop' is the per-token reference loop below (_label_row), kept as the
parity twin — tests/test_fused_vec.py holds them row-multiset identical.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.text import TOKEN_PATTERN
from ..schemas import MENTIONS, VOTES
from .gazetteer import build_trie
from .rules import RULE_PATTERNS

# combined stage-1 frame: mention rows (kind='m') + vote rows (kind='v').
# Votes reuse begin as pos and surface as tok; unused numeric fields are 0.
# begin_char/end_char are the mention's character span (Entity.begin_offset
# semantics, neat_base_classes.py:33-34) — 0 on vote rows.
S1_COMBINED = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("row_id", LongType(), False),
        StructField("lf_name", StringType(), False),
        StructField("begin", IntegerType(), False),
        StructField("end", IntegerType(), False),
        StructField("surface", StringType(), False),
        StructField("label", StringType(), False),
        StructField("base_conf", DoubleType(), False),
        StructField("confidence", DoubleType(), False),
        StructField("weight", DoubleType(), False),
        StructField("begin_char", IntegerType(), True),
        StructField("end_char", IntegerType(), True),
    ]
)

_COLS = [f.name for f in S1_COMBINED.fields]
_TYPES = {
    "row_id": "int64", "begin": "int32", "end": "int32",
    "base_conf": "float64", "confidence": "float64", "weight": "float64",
    "begin_char": "int32", "end_char": "int32",
}


# rule-trigger index: first trigger token -> [(lf_name, trigger, conf)].
# Scanning the corpus once per pattern is the reference's shape
# (one spacy Matcher pass per RuleAnnotator); a dict lookup per token gets
# identical output in one pass over the tokens.
_TRIG_MAP: dict[str, list[tuple[str, tuple[str, ...], float]]] = {}
for _idx, (_pname, _trig, _conf) in enumerate(RULE_PATTERNS):
    _TRIG_MAP.setdefault(_trig[0], []).append((f"rule{_idx}", _trig, _conf))


def _label_row(row_id: int, toks: list[str], low: list[str],
               starts: list[int], ends: list[int], trie: dict | None,
               freq_cutoffs: list[tuple[str, int]],
               common_ranks: dict[str, int], out: list,
               gaz_matches: list[tuple[int, int, float]] | None = None
               ) -> None:
    n = len(toks)

    # surface -> LFs whose J2 projection it feeds (built during extraction,
    # applied in the single vote pass below)
    surf_lfs: dict[str, list[str]] = {}

    # method/local bindings: this loop IS the engine's CPU floor (PLANS.md
    # §12), and attribute lookups inside it are measurable — bound append/
    # get + the single-probe trie walk measured ~7% on the label loop
    # (interleaved A/B, identical output hash)
    emit = out.append
    trig_get = _TRIG_MAP.get
    setdef = surf_lfs.setdefault

    # gazetteer matches either precomputed (TrieMatcher 'ahocorasick'
    # backend — gaz_matches from the caller; emitted up front, identical
    # row SET) or found by the inline dict-trie walk below (trie is None
    # exactly when gaz_matches is given)
    trie_get = trie.get if trie is not None else None
    if gaz_matches is not None:
        for gi, gj, w in gaz_matches:
            surf = " ".join(toks[gi:gj])
            lfs = setdef(surf, [])
            if "dictionary" not in lfs:
                lfs.append("dictionary")
            emit(("m", row_id, "dictionary", gi, gj, surf,
                  "PERSON_NAME", w, w, 0.0, starts[gi], ends[gj - 1]))

    for i, t in enumerate(toks):
        lt = low[i]

        # -- gazetteer trie (PhraseMatcher(LOWER) semantics: all matches at
        #    all positions — sweet/neat_extractors.py:159-183); one .get per
        #    step instead of `in` + index (two hash probes)
        if trie_get is not None:
            node = trie_get(lt)
            j = i
            while node is not None:
                j += 1
                if "\0" in node:
                    w = node["\0"]
                    surf = " ".join(toks[i:j])
                    lfs = setdef(surf, [])
                    if "dictionary" not in lfs:
                        lfs.append("dictionary")
                    emit(("m", row_id, "dictionary", i, j, surf,
                          "PERSON_NAME", w, w, 0.0, starts[i], ends[j - 1]))
                node = node.get(low[j]) if j < n else None

        # -- 27 rule patterns (neat_extractors.py:26-116; NNP = capitalized
        #    proxy). Trigger window: i in range(n - k) in the per-pattern
        #    form, i.e. the NNP index i+k must be < n.
        cands = trig_get(lt)
        if cands:
            for lf, trig, conf in cands:
                k = len(trig)
                if i + k >= n:
                    continue
                if k == 2 and low[i + 1] != trig[1]:
                    continue
                nnp = toks[i + k]
                c = nnp[0] if nnp else ""
                if c.isupper() and c.isalpha():
                    lfs = setdef(nnp, [])
                    if lf not in lfs:
                        lfs.append(lf)
                    emit(("m", row_id, lf, i + k, i + k + 1, nnp,
                          "PERSON_NAME", conf, conf, 0.0,
                          starts[i + k], ends[i + k]))

        # -- caps detectors (labeling_functions.py:76-97): position-faithful
        if i >= 1:
            lt_ = len(t)
            if lt_ > 2:
                if t.isupper():
                    emit(("m", row_id, "all_caps", i, i + 1, t,
                          "PERSON_NAME", 0.5, 0.5, 0.0, starts[i], ends[i]))
                    emit(("v", row_id, "all_caps", i, i + 1, t,
                          "PERSON_NAME", 0.0, 0.0, 1.0, 0, 0))
                if i < n - 2 and lt_ < 15:
                    c = t[0]
                    if c.isupper() and c.isalpha():
                        emit(("m", row_id, "name_case", i, i + 1, t,
                              "PERSON_NAME", 0.5, 0.5, 0.0,
                              starts[i], ends[i]))
                        emit(("v", row_id, "name_case", i, i + 1, t,
                              "PERSON_NAME", 0.0, 0.0, 1.0, 0, 0))

    # -- J2 span re-projection quirk (labeling_functions.py:27-54): every
    #    token whose EXACT text equals an extracted surface of that LF votes.
    # -- frequency antirules (create_lfs.py:17-34 + labeling_functions.py:135-143)
    surf_get = surf_lfs.get if surf_lfs else None
    rank_get = common_ranks.get if common_ranks else None
    if surf_get or rank_get:
        for i, t in enumerate(toks):
            lfs = surf_get(t) if surf_get else None
            if lfs:
                for lf in lfs:
                    emit(("v", row_id, lf, i, i + 1, t,
                          "PERSON_NAME", 0.0, 0.0, 1.0, 0, 0))
            if rank_get:
                r = rank_get(t)
                if r is not None:
                    for lf, max_rank in freq_cutoffs:
                        if r <= max_rank:
                            emit(("v", row_id, lf, i, i + 1, t,
                                  "NOT_NAME", 0.0, 0.0, 1.0, 0, 0))


def fused_stage1(corpus: DataFrame, gazetteer: dict[str, float],
                 common_ranks: dict[str, int] | None = None,
                 freq_cutoffs: list[tuple[str, int]] | None = None,
                 text_col: str = "content",
                 pattern: str = TOKEN_PATTERN,
                 trie_backend: str = "pure",
                 impl: str = "vector") -> DataFrame:
    """corpus -> S1_COMBINED (mention + vote rows) in one Arrow pass.

    ``trie_backend``: 'pure' (default) walks the dict trie inline;
    'ahocorasick' (import-gated, see gazetteer.TrieMatcher) precomputes the
    gazetteer matches per row with the C automaton — identical output row
    set, higher tokens/s/core where the extension exists.

    ``impl``: 'vector' (default) runs the columnar batch labeler
    (operators/fused_vec.py — per-unique predicate computation + numpy
    gather + columnar emission, ~2-3x the loop path's tokens/s/core);
    'loop' runs the per-token reference loop (_label_row). Row-set
    identical by tests/test_fused.py and tests/test_fused_vec.py."""
    spark = corpus.sparkSession
    trie_b = spark.sparkContext.broadcast(
        build_trie(gazetteer) if trie_backend == "pure" else None)
    weights_b = spark.sparkContext.broadcast(
        dict(gazetteer) if trie_backend != "pure" else None)
    ranks_b = spark.sparkContext.broadcast(common_ranks or {})
    cutoffs = freq_cutoffs or []
    tok_re = re.compile(pattern)

    if impl == "vector":
        from . import fused_vec

        def run_vec(batches) -> Iterator:
            from .gazetteer import TrieMatcher

            trie = trie_b.value
            factory = (
                (lambda: TrieMatcher(weights_b.value, backend=trie_backend))
                if trie is None else None)
            # mapInArrow: emission goes straight from the labeler's typed
            # numpy arrays to RecordBatches — no pandas block manager on
            # either the output (from_pandas introspection measured ~0.4 s
            # per 220k-row batch) and one RecordBatch per LF family (no
            # concat). Input column 1 is the text column (selected below).
            yield from fused_vec.run_arrow_batches(
                batches, 1, tok_re, trie, factory, ranks_b.value, cutoffs)

        return corpus.select("row_id", text_col).mapInArrow(
            run_vec, S1_COMBINED)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .gazetteer import TrieMatcher

        trie = trie_b.value
        matcher = (TrieMatcher(weights_b.value, backend=trie_backend)
                   if trie is None else None)
        ranks = ranks_b.value
        for pdf in batches:
            out: list[tuple] = []
            for row_id, text in zip(pdf["row_id"], pdf[text_col]):
                # finditer: same token stream as findall, plus char spans
                matches = list(tok_re.finditer(text or ""))
                toks = [m.group(0) for m in matches]
                low = [t.lower() for t in toks]
                gm = (sorted(matcher.matches(toks, low))
                      if matcher is not None else None)
                _label_row(int(row_id), toks, low,
                           [m.start() for m in matches],
                           [m.end() for m in matches],
                           trie, cutoffs, ranks, out, gaz_matches=gm)
            yield pd.DataFrame(out, columns=_COLS).astype(_TYPES)

    return corpus.select("row_id", text_col).mapInPandas(run, S1_COMBINED)


def split_mentions(combined: DataFrame) -> DataFrame:
    """S1_COMBINED -> MENTIONS (kind filter + column projection; pushes down
    to the parquet scan when reading a stored combined table)."""
    return combined.where(F.col("kind") == "m").select(
        *[f.name for f in MENTIONS.fields]
    )


def split_votes(combined: DataFrame) -> DataFrame:
    """S1_COMBINED -> VOTES (begin->pos, surface->tok)."""
    return combined.where(F.col("kind") == "v").select(
        "row_id",
        F.col("begin").alias("pos"),
        "lf_name",
        "label",
        "weight",
        F.col("surface").alias("tok"),
    )
