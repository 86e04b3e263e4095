"""Corpus sources.

Two ways to obtain the Iceberg-shaped source table
(repo, path, commit, lang, content) + (row_id, content_sha256):

* :func:`load_documents` — adapt the driver's ``documents`` parquet
  (doc_id, text, lang, source, n_chars) to the corpus shape.
* :func:`synthetic_corpus` — deterministic seeded generator with planted
  entities (FIXTURES.md F1) so precision AND recall are non-trivial; used by
  parity tests and the bench.

Both attach ``content_sha256 = sha2(content, 256)`` at scan time — the
per-row invariant (BASELINE.json input_hint) re-verified at stage boundaries.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import CORPUS

# Gazetteer of person names used by the synthetic corpus + default pipeline
# config (FIXTURES.md F4 shape: includes multi-token phrases and homograph
# negatives that are also common code tokens).
DEFAULT_GAZETTEER = {
    # name -> prior weight, reference shape: sweet/neat_extractors.py:147-150
    "alice": 0.9, "bob": 0.85, "carol": 0.8, "david": 0.75, "erin": 0.9,
    "frank": 0.7, "grace": 0.88, "heidi": 0.8, "ivan": 0.82, "judy": 0.8,
    "mallory": 0.9, "oscar": 0.6, "peggy": 0.85, "trent": 0.7, "victor": 0.75,
    "walter": 0.72, "sybil": 0.9, "wendy": 0.8,
    "mary ann": 0.9, "jean luc": 0.85, "anna maria": 0.88,
    # homograph negatives: real code tokens that are also names
    "main": 0.1, "max": 0.3, "val": 0.2,
}

_LANGS = ["python", "java", "go", "js", "md"]
_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "md": "md"}

# template fragments: code-ish filler (high-frequency confusable tokens that
# the frequency antirules must suppress).
_FILLER = (
    "def load parse main loop value result index token stream buffer "
    "return import class self data args max val key"
).split()

_RULE_TEMPLATES = [
    # trigger contexts of /root/reference/sweet/neat_extractors.py:28-56
    "please call me {NAME} after the build",
    "my name is {NAME} and i wrote this module",
    "ask for {NAME} when the test fails",
    "aka {NAME} in the commit log",
    "reviewed by miss {NAME} yesterday",
    "it is {NAME} who owns this file",
]
_CAPS_TEMPLATES = [
    "handoff to {NAME} for review",
    "ping {NAME} about the flaky test",
]


def _surface_variants(name: str) -> list[str]:
    """2-4 alias surfaces per entity to exercise linking + CC (FIXTURES.md F1)."""
    cap = " ".join(w.capitalize() for w in name.split())
    out = [cap, name.upper()]
    if len(name) > 4:
        out.append(cap[:4])  # abbreviation variant
    return out


def synthetic_rows(n_rows: int, seed: int = 42) -> list[tuple]:
    """Pure function of (seed, n_rows) -> list of corpus tuples (no Spark)."""
    return synthetic_rows_range(0, n_rows, seed)


def gold_entities(n_rows: int, seed: int = 42) -> dict[int, set[str]]:
    """Gold lower-cased entity sets per row for the P/R >= 0.95 gate."""
    gold: dict[int, set[str]] = {}
    names = [n for n in DEFAULT_GAZETTEER if DEFAULT_GAZETTEER[n] >= 0.5]
    for i in range(n_rows):
        h = int(hashlib.sha1(f"{seed}:{i}".encode()).hexdigest(), 16)
        ents: set[str] = set()
        bucket = h % 10
        if bucket < 8:
            name = names[h % len(names)]
            variant = _surface_variants(name)[(h >> 8) % len(_surface_variants(name))]
            ents.add(variant.lower())
        if h % 9 == 0:
            ents.add("alice")
        gold[i] = ents
    return gold


def _with_invariant(df: DataFrame) -> DataFrame:
    return df.withColumn("content_sha256", F.sha2(F.col("content"), 256))


def synthetic_rows_range(start: int, stop: int, seed: int = 42) -> list[tuple]:
    """synthetic_rows restricted to [start, stop) — each row depends only on
    (seed, i), so any index range can be generated independently."""
    names = [n for n in DEFAULT_GAZETTEER if DEFAULT_GAZETTEER[n] >= 0.5]
    rows = []
    for i in range(start, stop):
        h = int(hashlib.sha1(f"{seed}:{i}".encode()).hexdigest(), 16)
        lang = _LANGS[i % len(_LANGS)]
        repo = f"org{i % 7}/proj{i % 13}"
        path = f"src/mod{i % 23}/file{i}.{_EXT[lang]}"
        commit = hashlib.sha1(f"{seed}:commit:{i}".encode()).hexdigest()
        filler = " ".join(_FILLER[(h >> (4 * k)) % len(_FILLER)] for k in range(8))
        bucket = h % 10
        name = names[h % len(names)]
        variant = _surface_variants(name)[(h >> 8) % len(_surface_variants(name))]
        if bucket < 6:
            tpl = _RULE_TEMPLATES[(h >> 16) % len(_RULE_TEMPLATES)]
            body = tpl.format(NAME=variant)
        elif bucket < 8:
            tpl = _CAPS_TEMPLATES[(h >> 16) % len(_CAPS_TEMPLATES)]
            body = tpl.format(NAME=variant)
        else:
            body = "call the main function with max val and return"
        hub = " Alice said ok" if h % 9 == 0 else ""
        content = f"{filler} {body}{hub} {filler}"
        rows.append((i, repo, path, commit, lang, content))
    return rows


def synthetic_corpus(spark: SparkSession, n_rows: int, seed: int = 42,
                     partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic corpus. Generation is DISTRIBUTED (mapInPandas
    over spark.range): rows are a pure function of (seed, row index), so
    executors generate their own index ranges — no driver-side row list, no
    pickle-serialization bottleneck at bench scale (the driver-side
    createDataFrame of 600k rows alone took ~35 s)."""
    import pandas as pd

    par = partitions or spark.sparkContext.defaultParallelism * 2
    cols = [f.name for f in CORPUS.fields[:-1]]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in CORPUS.fields[:-1]
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].tolist()
            if not ids:
                yield pd.DataFrame(columns=cols)
                continue
            lo, hi = int(ids[0]), int(ids[-1])
            if hi - lo + 1 == len(ids):  # contiguous (spark.range partitions)
                rows = synthetic_rows_range(lo, hi + 1, seed)
            else:
                rows = [synthetic_rows_range(int(i), int(i) + 1, seed)[0]
                        for i in ids]
            yield pd.DataFrame(rows, columns=cols)

    df = spark.range(0, n_rows, 1, par).mapInPandas(gen, schema)
    return _with_invariant(df)


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt driver testdata documents.parquet to the corpus shape
    (FIXTURES.md F1 mapping: doc_id->row_id, text->content, source->repo)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.select(
        F.col("doc_id").cast("long").alias("row_id"),
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.sha2(F.concat_ws(":", F.col("doc_id"), F.col("source")), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    return _with_invariant(df)
