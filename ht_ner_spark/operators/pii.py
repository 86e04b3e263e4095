"""PII detection / redaction over a text column — the scrub pass every
public-web training pipeline runs before tokenization (C4/Dolma-style:
emails, phone numbers, IP addresses replaced with typed sentinels).

Reference analog: the reference has no scrub pass (its corpora are curated
NER datasets); the patterns follow the public Dolma/BigScience PII recipes.

100 TB shape: pure per-row column expressions (regexp_count +
regexp_replace) — whole-stage codegen, zero shuffle, zero Python. The regex
set is intentionally RE2-compatible (no backreferences or lookaround), so
the exact patterns run unchanged in the DuckDB oracle AND in any RE2-based
production scrubber; counts are taken on the not-yet-redacted text of each
category in a fixed category order, so engines agree even when categories
could overlap (an IPv4-looking email host is counted as the email it sits
in, never double-counted)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed redaction order: emails first (their hosts can contain dotted quads
# and digits), then IPv4, then phones. All three are RE2-safe.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

PII_CATEGORIES = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


# Credential/secret detectors for source-code corpora (the scrub the Stack
# v2 / BigCode pipelines run with detect-secrets/gitleaks-style regexes).
# All RE2-safe so the identical patterns run in Spark (Java regex), DuckDB
# and production RE2 scanners.  Fixed order, counted independently (kinds
# never overlap textually: distinct anchors).
SECRET_PATTERNS = [
    ("aws_key", r"\bAKIA[0-9A-Z]{16}\b"),
    ("github_pat", r"\bghp_[A-Za-z0-9]{36}\b"),
    ("url_credentials", r"[a-z][a-z0-9+.\-]*://[^/\s:@]+:[^/\s@]+@"),
    ("private_key", r"-----BEGIN [A-Z ]*PRIVATE KEY-----"),
]


def secret_scan(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, kind, n_hits) — one row per document per secret kind with
    at least one match; n_hits is the occurrence count of that kind.

    100 TB shape: per-row regexp_count per kind assembled into an array of
    (kind, n_hits) structs, one explode, a filter on n_hits > 0 — pure
    whole-stage-codegen column expressions, zero shuffle, zero Python.
    The filter means shuffle-free AND output-sparse: clean files emit
    nothing."""
    hits = F.array(*[
        F.struct(
            F.lit(kind).alias("kind"),
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
            .alias("n_hits"),
        )
        for kind, pat in SECRET_PATTERNS
    ])
    return (
        df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.explode(hits).alias("h"))
        .select("doc_id", F.col("h.kind").alias("kind"),
                F.col("h.n_hits").alias("n_hits"))
        .where(F.col("n_hits") > 0)
    )


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_phone, clean_text): per-category match
    counts plus the text with every match replaced by its typed sentinel.
    Counting happens on the text as it stands BEFORE that category's own
    redaction (but after the previous categories'), category order fixed by
    PII_CATEGORIES."""
    cur = F.col(text_col)
    cols = [F.col(id_col).cast("long").alias("doc_id")]
    for name, pat, repl in PII_CATEGORIES:
        cols.append(
            F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    cols.append(cur.alias("clean_text"))
    return df.select(*cols)
