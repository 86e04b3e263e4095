"""S8: token/tag corpus readers (CoNLL-style and WikiNER-style).

Reference loaders (/root/reference/src/dataset.py:293-321 Few-NERD
tab-separated reader; /root/reference/src/preprocess/wikiner.py:10-22
`word|pos|tag` space-separated-document reader) are sequential line loops
keyed by blank-line document boundaries — order-dependent, which a
distributed line-source cannot guarantee.

Spark shape: read each FILE whole (`spark.read.text(..., wholetext=True)`)
— one row per file, order inside the row trivially preserved — then split
documents and columns with array functions. Parallelism = files (the natural
unit for these corpora); a 10^5-file corpus scans embarrassingly parallel,
and Catalyst prunes to the single `value` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_conll(spark: SparkSession, path: str, sep: str = r"\t",
               token_field: int = 0, tag_field: int = 1) -> DataFrame:
    """CoNLL/Few-NERD shape: one `token<sep>tag` per line, blank line between
    documents -> (file, doc_idx, tokens:array<string>, tags:array<string>).

    doc_idx is the document's position within its file (stable, derived from
    the in-file split — not from row order)."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )
    docs = raw.select(
        "file",
        F.posexplode(
            F.filter(
                F.split(F.col("value"), r"\n\s*\n"),
                lambda d: F.trim(d) != "",
            )
        ).alias("doc_idx", "doc_text"),
    )
    lines = F.filter(F.split(F.col("doc_text"), r"\n"), lambda l: F.trim(l) != "")
    tok = F.transform(lines, lambda l: F.element_at(F.split(l, sep), token_field + 1))
    tag = F.transform(lines, lambda l: F.element_at(F.split(l, sep), tag_field + 1))
    return docs.select(
        "file", "doc_idx", tok.alias("tokens"), tag.alias("tags")
    )


def read_wikiner(spark: SparkSession, path: str) -> DataFrame:
    """WikiNER shape: one DOCUMENT per line, tokens space-separated, each
    token `word|pos|tag` (src/preprocess/wikiner.py:10-22) ->
    (file, doc_idx, tokens, pos_tags, ner_tags). Empty lines skipped.

    The reference reads `aij-wikiner-*.bz2` via bz2.open (wikiner.py:10);
    here compression is free: Hadoop's BZip2Codec decompresses `.bz2` text
    sources transparently (and splittably — a multi-GB .bz2 still scans in
    parallel), so the same call reads plain or compressed files
    (tests/test_sources_augment_gpt.py exercises the .bz2 path)."""
    raw = spark.read.text(path).select(
        F.input_file_name().alias("file"), "value"
    ).where(F.trim("value") != "")
    triples = F.transform(
        F.split(F.col("value"), " "), lambda t: F.split(t, r"\|")
    )
    return raw.select(
        "file",
        F.xxhash64("value").alias("doc_idx"),  # content-keyed (no row order)
        F.transform(triples, lambda t: t[0]).alias("tokens"),
        F.transform(triples, lambda t: t[1]).alias("pos_tags"),
        F.transform(triples, lambda t: t[2]).alias("ner_tags"),
    )


def load_hf_dataset(spark: SparkSession, dataset_name: str,
                    split: str = "train") -> DataFrame:
    """S8 HF-hub loader (reference: `datasets.load_dataset`,
    /root/reference/src/dataset.py:244-321). Import-gated like HFScorer —
    the hub client is absent in this sandbox and hub access needs network;
    environments with `datasets` get the reference path (driver-side load of
    the arrow table, parallelized via createDataFrame from arrow batches).
    Offline corpora use read_conll/read_wikiner on downloaded files."""
    try:
        import datasets  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "load_hf_dataset needs the 'datasets' package; use "
            "read_conll/read_wikiner on local files in environments "
            "without it"
        ) from e
    import datasets as _ds  # pragma: no cover - needs hub access

    d = _ds.load_dataset(dataset_name, split=split)
    return spark.createDataFrame(d.to_pandas())
