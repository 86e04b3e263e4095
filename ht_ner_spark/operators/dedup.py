"""Deduplication operators for large-scale training-data pipelines.

All are pure DataFrame compositions (no Python row loops):

* exact:        hash-groupBy on content digest — one shuffle, partial agg
* minhash+LSH:  word-shingle -> minhash per band -> band-bucket self-join
* simhash:      weighted sign-bit fingerprint, portable md5-bit variant
* n-gram Jaccard: exact verification on candidate pairs (within-row set ops)

Scale notes: signatures are O(docs × bands) rows (narrow after one groupBy);
the only join is the band-bucket self-join, guarded by the same max_block
skew cap as entity linking (hub buckets dropped + reported). At 100 TB run
dedup per band-bucket partition: `repartition(bucket)` colocates candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(content_md5, dup_count, keep_id, member_ids) for groups with >1 member.
    keep_id = min id (deterministic survivor election)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
        .where(F.col("dup_count") > 1)
    )


def word_shingles(col, k: int = 3):
    """array of distinct k-word shingles of lower(col) (whitespace split).

    The split is bound through a higher-order let (``F.aggregate`` over a
    1-element array): referencing ``F.split(...)`` directly inside the
    transform/filter lambdas re-inlines the regex split into EVERY element
    evaluation (Catalyst does not CSE across lambda boundaries), turning an
    n-token document into O(n^2) regex work — measured 2x+ on the
    documents-table minhash query."""
    def shingles(toks):
        return F.array_distinct(
            F.filter(
                F.transform(
                    toks,
                    lambda x, i: F.when(
                        i + k <= F.size(toks),
                        F.concat_ws(" ", F.slice(toks, i + 1, k)),
                    ),
                ),
                lambda s: s.isNotNull(),
            )
        )

    return F.aggregate(
        F.array(F.split(F.lower(col), r"\s+")),
        F.array().cast("array<string>"),
        lambda acc, toks: shingles(toks),
    )


def doc_minhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                k: int = 3, num_bands: int = 8, use_md5: bool = False) -> DataFrame:
    """(doc_id, band, sig): minhash signature per band over word k-shingles.
    use_md5=True is the DuckDB-portable variant (string-min of md5); the fast
    path is xxhash64 (JVM codegen)."""
    sh = df.select(F.col(id_col).alias("doc_id"),
                   F.explode(word_shingles(F.col(text_col), k)).alias("shingle"))

    # ONE hash-agg shuffle keyed by doc_id with num_bands min-aggregates,
    # instead of exploding num_bands× rows through the shuffle (same rewrite
    # as linking.minhash_signatures); (band, sig) unpacked within-row after.
    def h(b: int):
        if use_md5:
            return F.md5(F.concat_ws(":", F.lit(b), F.col("shingle")))
        # LONG sig on the fast path -> HashAggregate (string min falls back
        # to SortAggregate; see linking.minhash_signatures)
        return F.xxhash64(F.lit(b), F.col("shingle"))

    agg = sh.groupBy("doc_id").agg(
        *[F.min(h(b)).alias(f"_sig{b}") for b in range(num_bands)]
    )
    pairs = F.explode(
        F.array(
            *[
                F.struct(F.lit(b).cast("int").alias("band"),
                         F.col(f"_sig{b}").alias("sig"))
                for b in range(num_bands)
            ]
        )
    ).alias("bs")
    return agg.select("doc_id", pairs).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def minhash_dupe_pairs(signatures: DataFrame, min_shared_bands: int = 1,
                       max_block: int = 200
                       ) -> tuple[DataFrame, DataFrame]:
    """-> (pairs(src, dst, shared_bands), dropped_blocks(band, sig,
    block_size)): pairs of docs sharing >= min_shared_bands band signatures.
    Oversized buckets are the hub-skew guard — excluded and REPORTED, never
    silently capped (same contract as linking.lsh_candidates; the pipeline
    threads the dropped count into checkpoint counters)."""
    # materialize once: the self-join's two sides and the dropped-block
    # report otherwise re-execute the entire signature subtree (shingle
    # explode + minhash agg) per side — localCheckpoint is auto-released by
    # the ContextCleaner when dereferenced (same pattern as link_surfaces)
    signatures = signatures.localCheckpoint()
    sized = signatures.withColumn(
        "bs", F.count(F.lit(1)).over(Window.partitionBy("band", "sig"))
    )
    dropped = (
        sized.where(F.col("bs") > max_block)
        .groupBy("band", "sig")
        .agg(F.max("bs").alias("block_size"))
    )
    ok = sized.where(F.col("bs") <= max_block)
    a, b = ok.alias("a"), ok.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        .agg(F.count(F.lit(1)).alias("shared_bands"))
        .where(F.col("shared_bands") >= min_shared_bands)
    )
    return pairs, dropped


def ngram_jaccard_pairs(pairs_with_text: DataFrame, k: int = 3,
                        min_jaccard: float = 0.8,
                        a_col: str = "text_a", b_col: str = "text_b") -> DataFrame:
    """Exact word-shingle Jaccard verify on candidate pairs (narrow)."""
    ga, gb = word_shingles(F.col(a_col), k), word_shingles(F.col(b_col), k)
    sim = F.size(F.array_intersect(ga, gb)) / F.size(F.array_union(ga, gb))
    return pairs_with_text.withColumn("jaccard", sim).where(
        F.col("jaccard") >= min_jaccard
    )


def simhash_bits(col, bits: int = 16, token_split: str = r"\s+"):
    """Portable simhash: bit j = sign of sum over tokens of ±1, where a
    token votes +1 on bit j iff the first hex char of md5(token || ':' || j)
    is >= '8'. Returns an array<int> of bits (MSB first) — string/compare ops
    only, bit-identical in DuckDB."""
    toks = F.split(F.lower(col), token_split)
    def bit(j):
        votes = F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(
                F.substring(F.md5(F.concat_ws(":", t, F.lit(str(j)))), 1, 1) >= "8",
                1,
            ).otherwise(-1),
        )
        return F.when(votes > 0, F.lit(1)).otherwise(F.lit(0))
    return F.array(*[bit(j) for j in range(bits)])


def simhash_fingerprints(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """(doc_id, simhash): fingerprint as a '0'/'1' string (join/group key)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.concat_ws("", simhash_bits(F.col(text_col), bits)).alias("simhash"),
    )


def simhash_near_dupes(fps: DataFrame, max_hamming: int = 2,
                       bits: int = 16) -> DataFrame:
    """(src, dst, hamming): block on simhash segments — a fingerprint pair
    within Hamming distance d shares at least one of d+1 equal segments
    (pigeonhole needs d+1 segments, NOT fewer: with only 2 segments a pair
    differing by one bit in each half is silently missed) — then verify the
    exact Hamming distance. Avoids the all-pairs product; recall is exact
    for distance <= max_hamming (tests/test_dedup_recall.py checks against
    all-pairs ground truth)."""
    n = max_hamming + 1
    base, rem = divmod(bits, n)
    widths = [base + 1 if i < rem else base for i in range(n)]
    starts = [1 + sum(widths[:i]) for i in range(n)]
    segged = fps.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("seg"),
                         F.substring("simhash", starts[i], widths[i]).alias("key"))
                for i in range(n)
            ])
        ).alias("s"),
    ).select("doc_id", "simhash", F.col("s.seg").alias("seg"), F.col("s.key").alias("key"))
    a, b = segged.alias("a"), segged.alias("b")
    cand = (
        a.join(b, (F.col("a.seg") == F.col("b.seg")) & (F.col("a.key") == F.col("b.key")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"),
            F.col("a.simhash").alias("h1"), F.col("b.simhash").alias("h2"),
        )
        .distinct()
    )
    ham = F.size(
        F.filter(
            F.zip_with(F.split("h1", ""), F.split("h2", ""), lambda x, y: x != y),
            lambda d: d,
        )
    )
    return cand.withColumn("hamming", ham).where(
        F.col("hamming") <= max_hamming
    ).select("src", "dst", "hamming")


def span_dedup_stats(df: DataFrame, n: int = 8, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, total_spans, dup_spans, dup_frac): cross-document repeated
    n-gram span profile — the shingle-granularity form of exact-substring
    dedup (Lee et al. 2022, "Deduplicating Training Data ..."): a span
    instance is a duplicate iff the identical n-word gram occurs in ANY
    earlier (lower-id) document. The per-doc dup fraction is the signal a
    curation pass thresholds to drop boilerplate-heavy pages.

    100 TB shape: spans are counted at ALL positions (non-distinct — a page
    that repeats an earlier span 50× is 50 spans contaminated) but shuffled
    as md5 DIGESTS, never as the n-word strings (16 bytes vs ~50, and the
    corpus text never transits the wire twice). One gram-keyed agg finds
    each span's first-owner doc, one same-key join marks instances (AQE
    reuses the partitioning — the join adds no second shuffle of the big
    side), one doc-keyed agg folds the counters. Docs shorter than n words
    have no spans and drop out, keeping the output contamination-sized."""
    from .textstats import word_ngrams

    g = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    ).select("doc_id", F.md5("gram").alias("h"))
    owners = g.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        g.join(owners, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total_spans"),
            F.count(F.when(F.col("first_doc") < F.col("doc_id"), 1))
            .alias("dup_spans"),
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("total_spans").cast("long").alias("total_spans"),
            F.col("dup_spans").cast("long").alias("dup_spans"),
            F.round(F.col("dup_spans").cast("double") / F.col("total_spans"), 4)
            .alias("dup_frac"),
        )
    )


def boilerplate_lines(df: DataFrame, min_df: int = 3,
                      min_line_chars: int = 10,
                      text_col: str = "text", id_col: str = "doc_id",
                      source_col: str = "source") -> DataFrame:
    """(doc_id, n_lines, n_boiler, clean_hash): CCNet/RefinedWeb-style
    boilerplate removal — a line (newline-delimited, trimmed) that repeats
    across >= ``min_df`` DISTINCT docs of the SAME source is boilerplate
    (nav bars, cookie banners, license headers); short lines below
    ``min_line_chars`` chars are exempt from counting (they repeat for
    benign reasons). Emits per-doc totals plus the md5 of the doc with
    boilerplate lines removed (order-preserving) rather than the cleaned
    text itself, so the output stays audit-sized.

    100 TB shape: posexplode lines (narrow) → one (source, line) distinct-doc
    agg over the LONG lines only (the frequency dictionary — boilerplate
    vocab is tiny next to the corpus) → one dictionary join back (skew on a
    viral line is bounded: the dictionary side is one row per distinct
    line) → one doc-keyed agg rebuilding line order via sort_array on pos.
    No windows, no Python."""
    lines = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(source_col).alias("source"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).select("doc_id", "source", "pos", F.trim("line").alias("line"))
    longl = lines.where(F.length("line") >= min_line_chars)
    boiler = (
        longl.groupBy("source", "line")
        .agg(F.count_distinct("doc_id").alias("line_df"))
        .where(F.col("line_df") >= min_df)
        .select("source", "line", F.lit(True).alias("is_boiler"))
    )
    marked = lines.join(boiler, ["source", "line"], "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).alias("n_boiler"),
            F.md5(F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.when(
                        ~F.coalesce(F.col("is_boiler"), F.lit(False)),
                        F.struct("pos", "line")))),
                    lambda s: s["line"]),
            )).alias("clean_hash"),
        )
        .select("doc_id", F.col("n_lines").cast("long").alias("n_lines"),
                F.col("n_boiler").cast("long").alias("n_boiler"), "clean_hash")
    )


def dedup_normalized(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, canon_id, is_dup): exact dedup under CCNet-style text
    normalization — lowercase, collapse whitespace, strip everything
    outside [a-z0-9 ] — so trivially-mutated copies (case, punctuation,
    spacing) collapse onto one canonical doc (min doc_id per group). Raw
    sha dedup (dedup_exact) misses these; near-dup (MinHash) is overkill
    for them. The normalization is an explicit character class, not a
    locale/\\p{P}-dependent one, so any engine reproduces the key.

    100 TB shape: one narrow key computation fused into the scan, ONE
    min-agg shuffle on the md5 key, one broadcast-or-shuffle join back to
    tag members. No collect, no windows."""
    key = F.md5(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))),
                             "[^a-z0-9 ]", ""),
            " +", " ",
        )
    )
    keyed = df.select(F.col(id_col).cast("long").alias("doc_id"),
                      key.alias("k"))
    canon = keyed.groupBy("k").agg(F.min("doc_id").alias("canon_id"))
    return (
        keyed.join(canon, "k")
        .select("doc_id", "canon_id",
                (F.col("doc_id") != F.col("canon_id")).alias("is_dup"))
    )
