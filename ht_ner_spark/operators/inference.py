"""M1: batched token-classification inference (the reference's fine-tuned
DeBERTa/RoBERTa NER models run per row via HF pipeline + swifter.apply —
/root/reference/src/finetune_evaluation_HT.py:147,154-160).

Spark shape (SURVEY §2.9 M1): ONE `mapInPandas` pass; the model is loaded
once per executor process (module-level cache), device picked by
`torch.cuda.is_available()`, rows scored in Arrow batches. Post-processing
is the reference's own chain, reproduced faithfully:

* P7 entity-type filter: keep predictions whose `entity_group` is in the
  person-name label set {PER, NAME, person, PERSON} with optional B-/I-
  prefixes (finetune_evaluation_HT.py:90-101,106-108).
* T9 subword-marker strip: `word.strip('Ġ▁')` (neat_disambiguation.py:63-66).
* W2 adjacent-subtoken merge: fragments where `start == prev end` are merged
  into one mention (finetune_evaluation_HT.py:109-122) — done within-row
  here (the token stream is per-row); operators/merge.py holds the
  Window-based relational equivalent, and tests assert both agree.

Two classifiers behind one protocol (SURVEY §7.0 — torch/transformers are
absent in this sandbox):

* ``FakeTokenClassifier`` — deterministic md5-driven stand-in: each
  capitalized word is emitted as two adjacent char fragments with a hashed
  score and a label drawn from the name set (plus a NON-name decoy every few
  words, so the P7 filter is actually exercised). Makes the whole Spark path
  (schema, batching, filter, merge) testable bit-for-bit.
* ``HFTokenClassifier`` — the real path, import-gated.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator, Protocol

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# P7 name-label set (finetune_evaluation_HT.py:90-101): base labels ± B-/I-
NAME_LABELS = {"PER", "NAME", "person", "PERSON"}
NAME_SET = NAME_LABELS | {f"B-{x}" for x in NAME_LABELS} | {
    f"I-{x}" for x in NAME_LABELS
}

INFER_MENTIONS = StructType(
    [
        StructField("row_id", LongType(), False),
        StructField("surface", StringType(), False),
        StructField("begin_char", IntegerType(), False),
        StructField("end_char", IntegerType(), False),
        StructField("score", DoubleType(), False),
        StructField("n_fragments", IntegerType(), False),
    ]
)


class TokenClassifier(Protocol):
    def predict_batch(self, texts: list[str]) -> list[list[dict]]:
        """Per text: HF-pipeline-shaped dicts
        {entity_group, score, word, start, end}."""
        ...


_CAP_WORD = re.compile(r"\b[A-Z][a-zA-Z]+")


class FakeTokenClassifier:
    """Deterministic stand-in with the HF output contract."""

    def predict_batch(self, texts: list[str]) -> list[list[dict]]:
        out = []
        for text in texts:
            preds: list[dict] = []
            for m in _CAP_WORD.finditer(text or ""):
                word = m.group(0)
                h = int(hashlib.md5(word.encode()).hexdigest()[:6], 16)
                label = sorted(NAME_LABELS)[h % len(NAME_LABELS)]
                if h % 5 == 0:
                    label = "LOC"  # decoy: P7 must drop it
                score = (h % 1000) / 1000.0
                mid = m.start() + max(1, len(word) // 2)
                # two adjacent wordpiece fragments (start == prev end) with
                # a Ġ marker on the first — exercises T9 + W2
                preds.append({"entity_group": label, "score": score,
                              "word": "Ġ" + text[m.start():mid],
                              "start": m.start(), "end": mid})
                preds.append({"entity_group": label, "score": score,
                              "word": text[mid:m.end()],
                              "start": mid, "end": m.end()})
            out.append(preds)
        return out


_HF_CACHE: dict = {}


class HFTokenClassifier:  # pragma: no cover - needs torch/transformers
    """Real model path: per-process cached HF pipeline, GPU-aware."""

    def __init__(self, checkpoint: str):
        try:
            import torch  # noqa: F401
            import transformers  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "HFTokenClassifier needs transformers+torch; use "
                "FakeTokenClassifier in environments without them"
            ) from e
        self.checkpoint = checkpoint

    def _pipe(self):
        if self.checkpoint not in _HF_CACHE:
            import torch
            from transformers import pipeline

            _HF_CACHE[self.checkpoint] = pipeline(
                task="ner", model=self.checkpoint,
                aggregation_strategy="simple",
                device=0 if torch.cuda.is_available() else -1,
            )
        return _HF_CACHE[self.checkpoint]

    def predict_batch(self, texts: list[str]) -> list[list[dict]]:
        return self._pipe()(list(texts))


def _merge_row(preds: list[dict]) -> list[tuple]:
    """P7 filter + T9 strip + W2 char-adjacency merge for one row's
    predictions (reference `step`, finetune_evaluation_HT.py:103-122)."""
    kept = [p for p in preds if p["entity_group"] in NAME_SET]
    kept.sort(key=lambda p: p["start"])
    merged: list[list] = []
    for p in kept:
        word = p["word"].lstrip("Ġ▁")
        if merged and p["start"] == merged[-1][2]:
            merged[-1][0] += word
            merged[-1][2] = p["end"]
            # score: FIRST fragment's score kept (reference keeps the first
            # prediction's score on merge — same rule as merge.merge_adjacent)
            merged[-1][4] += 1
        else:
            merged.append([word, p["start"], p["end"], p["score"], 1])
    return [(w, s, e, sc, nf) for w, s, e, sc, nf in merged]


def token_classification_mentions(corpus: DataFrame,
                                  classifier: TokenClassifier | None = None,
                                  text_col: str = "content") -> DataFrame:
    """corpus -> INFER_MENTIONS via one Arrow pass. ``classifier`` defaults
    to the deterministic fake (config-swap to HFTokenClassifier('ckpt'))."""
    clf = classifier or FakeTokenClassifier()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            preds = clf.predict_batch(list(pdf[text_col].fillna("")))
            for row_id, row_preds in zip(pdf["row_id"], preds):
                for w, s, e, sc, nf in _merge_row(row_preds):
                    rows.append((int(row_id), w, s, e, sc, nf))
            yield pd.DataFrame(
                rows, columns=[f.name for f in INFER_MENTIONS.fields]
            ).astype({"row_id": "int64", "begin_char": "int32",
                      "end_char": "int32", "score": "float64",
                      "n_fragments": "int32"})

    return corpus.select("row_id", text_col).mapInPandas(run, INFER_MENTIONS)
