"""JSONL web-corpus source (S8 family — the interchange format a 100 TB
crawl actually arrives in: one JSON document per line, text + sparse
metadata).

The reference ingests its corpora from local CoNLL/TSV files
(`/root/reference/src/` loaders — see sources/conll.py for that parity);
this reader is the web-scale companion with three properties the naive
``spark.read.json(path)`` lacks:

* **No schema inference.** ``spark.read.json`` without a schema runs a FULL
  extra pass over the input to infer one — at 100 TB that doubles the scan.
  The schema here is explicit and fixed by the caller's field names.
* **Rejects are returned, not swallowed.** The scan is ``spark.read.text``
  + ``from_json`` (JVM Jackson, whole-stage codegen — no Python): a line
  that fails to parse, or parses without the text field, lands in the
  returned ``rejects`` frame (src_file, raw line) — the same
  dropped-rows-are-returned contract as dedup/linking's dropped blocks.
  This also sidesteps the PERMISSIVE ``_corrupt_record`` caveat (Spark
  refuses to filter on the corrupt column alone without caching the
  parsed frame — a non-starter at corpus scale).
* **One scan, no cache.** Both outputs derive from the same text scan;
  consumers that need both pay the scan twice OR persist — their call,
  not hidden policy.

row_id: taken from ``id_field`` when the corpus carries one; otherwise
``xxhash64(src_file, raw_line)`` — deterministic across reruns of the same
files (unlike ``monotonically_increasing_id``), with the documented caveat
that byte-identical duplicate lines in the same file collide (exact-dedup
semantics, usually wanted for a crawl; pass an id_field when it is not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    *,
    text_field: str = "text",
    id_field: str | None = "id",
    repo_field: str | None = "source",
    path_field: str | None = "url",
    lang_field: str | None = "lang",
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON into the engine CORPUS shape.

    Returns ``(corpus, rejects)``: corpus with the standard columns
    (row_id, repo, path, commit, lang, content, content_sha256); rejects as
    (src_file, line) for every input line that is not a JSON object with a
    non-null ``text_field``.
    """
    fields = [StructField(text_field, StringType(), True)]
    if id_field:
        fields.append(StructField(id_field, LongType(), True))
    for f in (repo_field, path_field, lang_field):
        if f:
            fields.append(StructField(f, StringType(), True))
    schema = StructType(fields)

    lines = spark.read.text(path).select(
        F.col("value").alias("line"),
        F.input_file_name().alias("src_file"),
    )
    parsed = lines.withColumn("j", F.from_json("line", schema))

    ok = F.col(f"j.{text_field}").isNotNull()
    rejects = parsed.where(~ok).select("src_file", "line")

    fallback_id = F.xxhash64("src_file", "line")
    row_id = (
        F.coalesce(F.col(f"j.{id_field}"), fallback_id)
        if id_field else fallback_id
    )
    repo = (
        F.coalesce(F.col(f"j.{repo_field}"), F.lit("web"))
        if repo_field else F.lit("web")
    )
    doc_path = (
        F.coalesce(F.col(f"j.{path_field}"), F.col("src_file"))
        if path_field else F.col("src_file")
    )
    lang = F.col(f"j.{lang_field}") if lang_field else F.lit(None).cast("string")

    from ..corpus import _with_invariant

    corpus = parsed.where(ok).select(
        row_id.cast("long").alias("row_id"),
        repo.alias("repo"),
        doc_path.alias("path"),
        # same derived-commit convention as corpus.load_documents: a stable
        # 40-hex lineage key from the document identity, not a real VCS ref
        F.sha2(F.concat_ws(":", row_id.cast("string"), repo), 256)
        .substr(1, 40).alias("commit"),
        lang.alias("lang"),
        F.col(f"j.{text_field}").alias("content"),
    )
    return _with_invariant(corpus), rejects
