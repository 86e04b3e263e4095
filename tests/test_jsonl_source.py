"""JSONL web-corpus reader (sources/jsonl.py): schema-explicit parse into
the CORPUS shape, rejects returned (never silently dropped), deterministic
row ids, sha256 invariant attached at scan time."""
import hashlib
import json

import pytest

from ht_ner_spark.sources.jsonl import read_jsonl_corpus

GOOD = [
    {"id": 7, "text": "alice wrote this module", "source": "crawl-a",
     "url": "http://x/1", "lang": "en"},
    {"id": 8, "text": "ping bob about the flaky test", "source": "crawl-a",
     "url": "http://x/2", "lang": "en"},
    # sparse metadata: no id / source / url / lang -> fallbacks
    {"text": "no metadata at all"},
]
BAD = [
    '{"id": 9, "source": "crawl-b"}',      # parses, but no text field
    '{not json at all',                    # malformed
    '"just a string"',                     # valid JSON, not an object
]


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    with open(d / "part-0.jsonl", "w") as f:
        for row in GOOD[:2]:
            f.write(json.dumps(row) + "\n")
        for raw in BAD:
            f.write(raw + "\n")
        f.write(json.dumps(GOOD[2]) + "\n")
    return str(d)


def test_corpus_shape_and_rejects(spark, jsonl_dir):
    corpus, rejects = read_jsonl_corpus(spark, jsonl_dir)
    from ht_ner_spark.schemas import CORPUS

    # drop-in pipeline compatibility: same columns and types as the
    # parquet/synthetic corpus sources
    assert [(f.name, f.dataType) for f in corpus.schema.fields] == [
        (f.name, f.dataType) for f in CORPUS.fields]
    rows = {r["row_id"]: r for r in corpus.collect()}
    assert len(rows) == 3
    assert rows[7]["content"] == "alice wrote this module"
    assert rows[7]["repo"] == "crawl-a"
    assert rows[7]["path"] == "http://x/1"
    assert rows[7]["lang"] == "en"
    assert len(rows[7]["commit"]) == 40
    # every input line is accounted for: 3 corpus + 3 rejects = 6 lines
    rej = rejects.collect()
    assert len(rej) == 3
    assert {r["line"] for r in rej} == set(BAD)
    # sha invariant matches a local hashlib recount
    for r in rows.values():
        assert r["content_sha256"] == hashlib.sha256(
            r["content"].encode()).hexdigest()


def test_fallbacks_and_determinism(spark, jsonl_dir):
    corpus, _ = read_jsonl_corpus(spark, jsonl_dir)
    no_meta = [r for r in corpus.collect() if r["content"] == GOOD[2]["text"]]
    assert len(no_meta) == 1
    r = no_meta[0]
    assert r["repo"] == "web"
    assert r["path"].endswith("part-0.jsonl")  # src_file fallback
    assert r["lang"] is None
    # fallback row_id is stable across re-reads of the same file
    again, _ = read_jsonl_corpus(spark, jsonl_dir)
    r2 = [x for x in again.collect() if x["content"] == GOOD[2]["text"]][0]
    assert r2["row_id"] == r["row_id"]


def test_no_id_field_mode(spark, jsonl_dir):
    corpus, rejects = read_jsonl_corpus(spark, jsonl_dir, id_field=None)
    assert corpus.count() == 3
    assert rejects.count() == 3
    assert corpus.select("row_id").distinct().count() == 3
