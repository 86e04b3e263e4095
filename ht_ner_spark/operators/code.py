"""Code-aware corpus operators: import graphs, symbol extraction, module
similarity.

The north-star corpus is an Iceberg table of source-code repositories
(repo, path, commit, lang, content).  Beyond NER-style mention detection,
a source-code KG needs *code-structural* triples: which module a file
imports (``(repo, imports, module)``), which symbols a file defines
(``(path, defines, symbol)``), and which repos are similar because they
share dependencies.  The reference pipeline has no analog (it is a
natural-language NER stack); these operators extend the engine the way a
training-data/code-KG pipeline would use it (StarCoder/The-Stack-style
dependency and symbol metadata extraction).

Scale notes (10^12 files):

* ``extract_imports`` / ``extract_symbols`` are pure narrow projections —
  ``regexp_extract_all`` + ``explode`` inside whole-stage codegen, no
  Python, no shuffle.  They scale linearly with input splits.
* ``import_graph`` is one hash-aggregate shuffle keyed on
  (src, dst) — partial aggregation map-side combines duplicate edges
  before the exchange, so the shuffle volume is the number of *distinct*
  edges per partition, not the number of import statements.
* ``module_jaccard`` self-joins the edge list on the imported module.  A
  module imported by k sources contributes k^2 candidate pairs, so hub
  modules (stdlib, logging, ...) blow up quadratically: the ``cap``
  parameter drops modules above a source-degree ceiling *before* the
  join (the standard frequency-cap trick from co-citation / LSH-bucket
  analysis; same guard as linking.py's band-bucket cap).  Dropped hubs
  are REPORTED in the returned frame's companion (see function doc), not
  silently ignored.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "CALL_KEYWORDS",
    "CALL_PATTERNS",
    "IMPORT_PATTERNS",
    "SYMBOL_PATTERNS",
    "call_edges",
    "canonical_aliases",
    "clone_pairs",
    "code_quality",
    "code_triples",
    "extract_calls",
    "extract_imports",
    "extract_symbols",
    "import_graph",
    "license_detect",
    "module_jaccard",
    "resolve_calls",
    "split_identifiers",
    "top_symbols",
]

# Per-language import-statement heads.  RE2-safe (no lookaround/backrefs) so
# the same pattern runs on Spark (Java regex), DuckDB (RE2) and Python `re`.
# Group 1 is the imported module path.
IMPORT_PATTERNS: dict[str, str] = {
    "python": r"(?m)^\s*(?:from|import)\s+([A-Za-z_][A-Za-z0-9_\.]*)",
    "java": r"(?m)^\s*import\s+(?:static\s+)?([A-Za-z_][A-Za-z0-9_\.]*)",
    "go": r"(?m)^\s*(?:import\s+)?\"([A-Za-z0-9_\./\-]+)\"",
    "js": r"(?m)(?:require\(|from\s+)['\"]([A-Za-z0-9_\./@\-]+)['\"]",
}

# Per-language symbol-definition heads.  Group 1 = kind keyword, group 2 =
# symbol name — extracted as one combined pattern per language so a single
# regexp_extract_all pass covers every kind.
SYMBOL_PATTERNS: dict[str, str] = {
    "python": r"(?m)^\s*(def|class)\s+([A-Za-z_][A-Za-z0-9_]*)",
    "java": r"(?m)\b(class|interface|enum)\s+([A-Za-z_][A-Za-z0-9_]*)",
    "go": r"(?m)^\s*(func|type)\s+\(?[^)\n]*?\)?\s*([A-Za-z_][A-Za-z0-9_]*)",
    "js": r"(?m)\b(function|class)\s+([A-Za-z_][A-Za-z0-9_$]*)",
}

# Per-language call-site heads.  Each pattern is a two-branch alternation:
# the FIRST branch consumes definition sites (def/class/function headers,
# whose name is followed by '(' and would otherwise read as a call) with NO
# capture, so regexp_extract_all yields '' for them (Java and RE2 agree:
# a non-participating group extracts as empty); the SECOND branch captures a
# free identifier immediately followed by '(' that is NOT preceded by '.'
# or a word char — method calls (obj.m(...)) are deliberately excluded
# because a surface-name resolver cannot attribute them.  RE2-safe: plain
# alternation, no lookaround.
CALL_PATTERNS: dict[str, str] = {
    "python": (r"(?m)^\s*(?:async\s+)?(?:def|class)\s+"
               r"[A-Za-z_][A-Za-z0-9_]*\s*[(:]"
               r"|(?:^|[^.\w])([A-Za-z_][A-Za-z0-9_]*)\s*\("),
    # Java declarations have no keyword on the name itself (``void m(``),
    # so the dead branch lists the common return/declaration heads — a
    # documented heuristic: methods returning a user type are still read
    # as calls by a surface-name extractor.
    "java": (r"(?m)\b(?:class|interface|enum|new|void|int|long|float|double"
             r"|boolean|byte|short|char|String|var)"
             r"\s+[A-Za-z_][A-Za-z0-9_]*\s*[({<]"
             r"|(?:^|[^.\w])([A-Za-z_][A-Za-z0-9_]*)\s*\("),
    # The dead branch starts at `(?:^|\s)` rather than a bare `^`: the
    # live branch can otherwise match one char EARLIER (at the newline
    # before `func`) and win leftmost, capturing `func` as a callee.
    "go": (r"(?m)(?:^|\s)\s*func\s+(?:\([^)\n]*\)\s*)?"
           r"[A-Za-z_][A-Za-z0-9_]*\s*\("
           r"|(?:^|[^.\w])([A-Za-z_][A-Za-z0-9_]*)\s*\("),
    "js": (r"(?m)\b(?:function|class)\s+[A-Za-z_$][A-Za-z0-9_$]*\s*[({]"
           r"|(?:^|[^.\w])([A-Za-z_$][A-Za-z0-9_$]*)\s*\("),
}

# Control-flow / declaration keywords that syntactically precede '(' in at
# least one covered language and must never be read as callees.
CALL_KEYWORDS: tuple[str, ...] = (
    "if", "elif", "while", "for", "switch", "catch", "return", "with",
    "assert", "except", "not", "and", "or", "in", "is", "yield", "del",
    "raise", "lambda", "case", "defer", "go", "select", "typeof", "await",
    "void", "new", "throw", "synchronized", "function",
)

_DEFAULT_LANG = "python"


def _lang_extract(text_col: Column, lang_col: Column,
                  patterns: dict[str, str], group: int) -> Column:
    """CASE over per-language regexp_extract_all calls; unknown langs fall
    back to python's.  Each branch's pattern is a string LITERAL (Spark's
    regexp functions require a foldable pattern), so codegen compiles each
    regex once per task, not per row."""
    fallback = F.regexp_extract_all(
        text_col, F.lit(patterns[_DEFAULT_LANG]), F.lit(group))
    out = None
    for lang, pat in patterns.items():
        branch = F.regexp_extract_all(text_col, F.lit(pat), F.lit(group))
        cond = lang_col == lang
        out = F.when(cond, branch) if out is None else out.when(cond, branch)
    return out.otherwise(fallback)


def extract_imports(corpus: DataFrame, text_col: str = "content",
                    lang_col: str = "lang", id_col: str = "row_id",
                    src_col: str = "repo") -> DataFrame:
    """(id, src, module) — one row per distinct imported module per file.

    Narrow plan: regexp_extract_all → array_distinct → explode.  No Python,
    no shuffle; the regex is selected per-language via a literal CASE so
    whole-stage codegen keeps the pattern compiled.
    """
    mods = _lang_extract(F.col(text_col), F.col(lang_col), IMPORT_PATTERNS, 1)
    return (
        corpus.select(
            F.col(id_col).alias("row_id"),
            F.col(src_col).alias("src"),
            F.array_distinct(mods).alias("modules"),
        )
        .select("row_id", "src", F.explode("modules").alias("module"))
    )


def extract_symbols(corpus: DataFrame, text_col: str = "content",
                    lang_col: str = "lang", id_col: str = "row_id",
                    src_col: str = "repo") -> DataFrame:
    """(id, src, lang, kind, symbol) — defined symbols per file.

    Two regexp_extract_all passes over the same combined pattern (group 1 =
    kind, group 2 = name) zipped positionally with arrays_zip — still a
    narrow plan, one explode.
    """
    kinds = _lang_extract(F.col(text_col), F.col(lang_col), SYMBOL_PATTERNS, 1)
    names = _lang_extract(F.col(text_col), F.col(lang_col), SYMBOL_PATTERNS, 2)
    return (
        corpus.select(
            F.col(id_col).alias("row_id"),
            F.col(src_col).alias("src"),
            F.col(lang_col).alias("lang"),
            F.explode(F.arrays_zip(kinds.alias("kind"), names.alias("symbol"))).alias("ks"),
        )
        .select("row_id", "src", "lang", F.col("ks.kind").alias("kind"),
                F.col("ks.symbol").alias("symbol"))
    )


def extract_calls(corpus: DataFrame, text_col: str = "content",
                  lang_col: str = "lang", id_col: str = "row_id",
                  src_col: str = "repo") -> DataFrame:
    """(row_id, src, callee) — distinct free-function call targets per file.

    Narrow plan like extract_imports: a per-language literal-CASE
    regexp_extract_all, array_distinct, then array_except against the
    definition-site empties ('') and the CALL_KEYWORDS blocklist (control
    keywords like ``if (``/``while (`` match the call shape in C-family
    languages), then one explode.  No Python, no shuffle."""
    raw = _lang_extract(F.col(text_col), F.col(lang_col), CALL_PATTERNS, 1)
    drop = F.array(F.lit(""), *[F.lit(k) for k in CALL_KEYWORDS])
    return (
        corpus.select(
            F.col(id_col).alias("row_id"),
            F.col(src_col).alias("src"),
            F.array_except(F.array_distinct(raw), drop).alias("callees"),
        )
        .select("row_id", "src", F.explode("callees").alias("callee"))
    )


def resolve_calls(calls: DataFrame, symbols: DataFrame,
                  ambiguity_cap: int = 10) -> DataFrame:
    """Resolve call sites against the corpus symbol inventory:
    (caller, def_repo, symbol, n_files) — repo A's files call symbol S
    defined in repo B, witnessed by n_files distinct caller files.

    The classic code-KG linking join, with the same hub discipline as
    module_jaccard / the LSH band cap: a surface name defined in k repos
    fans every call site out k ways, and utility names (``main``,
    ``test``, ``init``) are defined everywhere — so symbols whose
    definition spans more than ``ambiguity_cap`` distinct repos are
    dropped as unresolvable BEFORE the join (standard surface-form
    linking practice; the capped set is also the honest one — a name
    defined in 500 repos carries no linkage signal).

    Plan: distinct on (def_repo, symbol), then a symbol-partitioned COUNT
    window for the degree cap (partition sizes bounded by per-symbol repo
    degree; same pre-join guard shape as clone_pairs), then ONE hash join
    keyed on the symbol string (the cap bounds per-key fan-out at
    ambiguity_cap), then the witness aggregate.  The symbol dictionary is
    corpus-sized at 10^12 files, so the join stays a shuffle join — AQE
    may still broadcast it at small scale."""
    sym = (
        symbols.select(F.col("src").alias("def_repo"), "symbol").distinct()
        .withColumn("n_def_repos",
                    F.count("*").over(Window.partitionBy("symbol")))
        .where(F.col("n_def_repos") <= ambiguity_cap)
        .drop("n_def_repos")
    )
    return (
        calls.join(sym, calls["callee"] == sym["symbol"])
        .groupBy(F.col("src").alias("caller"), "def_repo", "symbol")
        .agg(F.countDistinct("row_id").alias("n_files"))
    )


def call_edges(corpus: DataFrame, text_col: str = "content",
               lang_col: str = "lang", id_col: str = "row_id",
               src_col: str = "repo", ambiguity_cap: int = 10) -> DataFrame:
    """End-to-end call-graph edges from raw source: extract_calls +
    extract_symbols + resolve_calls.  Scan → two narrow regex projections
    → one symbol-keyed join → one witness aggregate."""
    c = extract_calls(corpus, text_col, lang_col, id_col, src_col)
    s = extract_symbols(corpus, text_col, lang_col, id_col, src_col)
    return resolve_calls(c, s, ambiguity_cap)


def code_quality(corpus: DataFrame, text_col: str = "content",
                 id_col: str = "row_id", max_line: int = 1000,
                 max_avg_line: int = 100,
                 min_alnum_frac: float = 0.25) -> DataFrame:
    """StarCoder/The-Stack-style per-file quality stats + keep flag:
    (row_id, n_lines, max_line_len, avg_line_len, alnum_frac, keep).

    The standard pre-training file filters: minified/generated files have
    kilobyte single lines (max_line_len), data blobs have huge average
    lines (avg_line_len), and binary-ish/encoded files have low
    alphanumeric fraction.  Defaults are the published StarCoder cuts.

    100 TB shape: pure per-row column expressions (split + transform +
    aggregate over the line array, one regexp_replace for the alnum
    count) — whole-stage codegen, zero shuffle, zero Python."""
    lines = F.split(F.col(text_col), "\n")
    lens = F.transform(lines, lambda ln: F.length(ln))
    n_lines = F.size(lines)
    total = F.aggregate(lens, F.lit(0), lambda a, x: a + x)
    n_alnum = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z0-9]", ""))
    n_chars = F.length(F.col(text_col))
    avg_line = F.round(total / n_lines, 4)
    alnum = F.round(n_alnum / F.nullif(n_chars, F.lit(0)), 4)
    return corpus.select(
        F.col(id_col).alias("row_id"),
        n_lines.cast("long").alias("n_lines"),
        F.array_max(lens).cast("long").alias("max_line_len"),
        avg_line.alias("avg_line_len"),
        alnum.alias("alnum_frac"),
        ((F.array_max(lens) <= max_line)
         & (avg_line <= max_avg_line)
         & (alnum >= min_alnum_frac)).alias("keep"),
    )


# SPDX header capture (group 1 = license id) + ordered fallback phrase
# dictionary (first hit wins) — the two-tier detection every source-corpus
# compliance pass runs (go-license-detector / ScanCode style, flattened to
# the regex tier that needs no model).  RE2-safe.
SPDX_RE = r"SPDX-License-Identifier:\s*([A-Za-z0-9.+\-]+)"
LICENSE_PHRASES: list[tuple[str, str]] = [
    ("apache-2.0", "Apache License, Version 2.0"),
    ("gpl-3.0", "GNU General Public License"),
    ("mit", "MIT License"),
    ("bsd-3-clause", "BSD 3-Clause"),
    ("mpl-2.0", "Mozilla Public License"),
]


def license_detect(corpus: DataFrame, text_col: str = "content",
                   id_col: str = "row_id") -> DataFrame:
    """(row_id, license, method) — per-file license identification:
    an SPDX header wins (method='spdx', id lower-cased to the slug
    space), else the first matching license phrase in LICENSE_PHRASES
    order (method='phrase'); files with neither emit nothing.

    100 TB shape: one regexp_extract + a fixed CASE of contains() — pure
    per-row codegen expressions, zero shuffle, zero Python, output-sparse
    (unlicensed files cost nothing downstream)."""
    spdx = F.regexp_extract(F.col(text_col), SPDX_RE, 1)
    phrase = None
    for slug, needle in LICENSE_PHRASES:
        cond = F.col(text_col).contains(needle)
        phrase = (F.when(cond, F.lit(slug)) if phrase is None
                  else phrase.when(cond, F.lit(slug)))
    lic = F.when(spdx != "", F.lower(spdx)).otherwise(phrase)
    method = F.when(spdx != "", F.lit("spdx")).otherwise(
        F.when(phrase.isNotNull(), F.lit("phrase")))
    return (
        corpus.select(F.col(id_col).alias("row_id"), lic.alias("license"),
                      method.alias("method"))
        .where(F.col("license").isNotNull())
    )


# Word boundaries inside identifiers, applied in order: the acronym rule
# first (HTTPServer -> HTTP_Server) so the simple rule then sees a clean
# lower->Upper edge (parseHTTP_Server -> parse_HTTP_Server).  RE2-safe —
# plain capture groups, no lookaround — so the DuckDB oracle runs the
# literal same patterns.
IDENT_ACRONYM_RE = "([A-Z]+)([A-Z][a-z])"
IDENT_CAMEL_RE = "([a-z0-9])([A-Z])"


def split_identifiers(df: DataFrame, ident_col: str = "symbol",
                      out_col: str = "parts") -> DataFrame:
    """Append ``out_col``: the identifier's lower-cased word parts —
    camelCase / PascalCase / snake_case / SCREAMING_SNAKE all normalize to
    the same word sequence (``parseHTTPServer`` and ``parse_http_server``
    both -> [parse, http, server]).  This is the surface-form normalizer
    for NER over code: mention matching, gazetteer lookup, and subtoken
    vocabularies all operate on these parts rather than raw identifiers.

    100 TB shape: two regexp_replace + lower + split + filter — pure
    per-row codegen expressions, zero shuffle, zero Python."""
    s = F.regexp_replace(F.col(ident_col), IDENT_ACRONYM_RE, r"$1_$2")
    s = F.regexp_replace(s, IDENT_CAMEL_RE, r"$1_$2")
    parts = F.filter(F.split(F.lower(s), "_+"), lambda x: x != "")
    return df.withColumn(out_col, parts)


def canonical_aliases(symbols: DataFrame,
                      ident_col: str = "symbol") -> DataFrame:
    """Alias canonicalization over identifier surface forms: variants that
    share the same word sequence (``parseHTTPServer``,
    ``parse_http_server``, ``ParseHttpServer``) collapse to one canonical
    entity (``parse_http_server``).  Returns (canonical, n_variants,
    variants) with variants the sorted comma-joined surface list — the
    alias table the stage-3 canonicalizer feeds entity cards from, the
    code-KG analog of HT-NER's name-variant merging.

    Shape at scale: the split is per-row codegen (split_identifiers), then
    one distinct on the surface form (map-side combine) and one groupBy on
    the canonical key.  No join; variant lists are bounded by casing
    conventions (a handful per canonical), so collect_set stays tiny."""
    surf = symbols.select(F.col(ident_col).alias("symbol")).distinct()
    canon = split_identifiers(surf, ident_col="symbol").select(
        "symbol", F.array_join("parts", "_").alias("canonical"))
    return canon.groupBy("canonical").agg(
        F.count("*").alias("n_variants"),
        F.array_join(F.sort_array(F.collect_set("symbol")), ",")
        .alias("variants"))


def import_graph(imports: DataFrame, min_files: int = 1) -> DataFrame:
    """Weighted module-dependency edges: (src, dst=module, n_files).

    One hash-aggregate shuffle on (src, module); map-side partial combine
    collapses per-partition duplicates first, so shuffle bytes scale with
    distinct edges.  ``min_files`` prunes noise edges post-agg (cheap:
    filter on the aggregate output, no extra pass).
    """
    return (
        imports.groupBy(F.col("src"), F.col("module").alias("dst"))
        .agg(F.countDistinct("row_id").alias("n_files"))
        .where(F.col("n_files") >= min_files)
    )


def module_jaccard(edges: DataFrame, cap: int = 15,
                   min_jaccard: float = 0.0) -> DataFrame:
    """Pairwise Jaccard between sources over their imported-module sets.

    (src_a, src_b, inter, union_sz, jaccard) for src_a < src_b.

    Plan (scale-shaped like linking.py's LSH bucket join):

    1. distinct (src, dst) — one exchange;
    2. drop hub modules whose source-degree exceeds ``cap`` BEFORE the
       self-join (a module imported by k sources yields k(k-1)/2 pairs —
       uncapped stdlib hubs make this quadratic in the corpus);
    3. self-join on dst, aggregate intersection counts per pair;
    4. broadcast-join the per-source set sizes (|sources| << |edges|)
       to finish |A∪B| = |A|+|B|−|A∩B|.

    The set sizes in step 4 are computed over the CAPPED edge set so the
    Jaccard is internally consistent (it is the similarity of the
    capped-universe sets — the standard semantics for frequency-capped
    co-citation).
    """
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy("dst").agg(F.countDistinct("src").alias("src_deg"))
    kept = (
        e.join(F.broadcast(deg.where(F.col("src_deg") <= cap)), "dst", "inner")
        .select("src", "dst")
    )
    sizes = kept.groupBy("src").agg(F.count("*").alias("set_sz"))
    a = kept.select(F.col("src").alias("src_a"), "dst")
    b = kept.select(F.col("src").alias("src_b"), "dst")
    pairs = (
        a.join(b, "dst")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs
        .join(F.broadcast(sizes.select(F.col("src").alias("src_a"),
                                       F.col("set_sz").alias("sz_a"))), "src_a")
        .join(F.broadcast(sizes.select(F.col("src").alias("src_b"),
                                       F.col("set_sz").alias("sz_b"))), "src_b")
        .select(
            "src_a", "src_b", "inter",
            (F.col("sz_a") + F.col("sz_b") - F.col("inter")).alias("union_sz"),
            F.round(F.col("inter") /
                    (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4)
            .alias("jaccard"),
        )
    )
    if min_jaccard > 0:
        out = out.where(F.col("jaccard") >= min_jaccard)
    return out


def code_triples(corpus: DataFrame, text_col: str = "content",
                 lang_col: str = "lang", id_col: str = "row_id",
                 src_col: str = "repo") -> DataFrame:
    """Code-structural KG triples: (subj, pred, obj, n_witnesses).

    * ``(repo, imports, module)`` — repo-level dependency facts;
    * ``(repo, defines, symbol)`` — repo-level symbol inventory.

    The stage-4 shape (triples.py): each arm is one hash aggregate on its
    (subj, pred, obj) key with countDistinct(file) as the witness count —
    the dedup and the evidence weighting happen in the same shuffle, and a
    downstream ``repartition('pred').write.partitionBy('pred')`` keeps the
    layout contract.  Composes the narrow extractors, so end-to-end the
    plan is scan → regex-project → explode → two parallel aggregates →
    union (no joins at all).
    """
    imp = extract_imports(corpus, text_col, lang_col, id_col, src_col)
    sym = extract_symbols(corpus, text_col, lang_col, id_col, src_col)
    imports_t = (
        imp.groupBy(F.col("src").alias("subj"),
                    F.col("module").alias("obj"))
        .agg(F.countDistinct("row_id").alias("n_witnesses"))
        .select("subj", F.lit("imports").alias("pred"), "obj", "n_witnesses")
    )
    defines_t = (
        sym.groupBy(F.col("src").alias("subj"),
                    F.col("symbol").alias("obj"))
        .agg(F.countDistinct("row_id").alias("n_witnesses"))
        .select("subj", F.lit("defines").alias("pred"), "obj", "n_witnesses")
    )
    return imports_t.unionByName(defines_t)


def clone_pairs(df: DataFrame, k: int = 3, w: int = 4,
                min_shared: int = 3, cap: int = 50,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """MOSS-style clone detection (Schleimer 2003): document pairs sharing
    >= min_shared winnowing fingerprints, with containment overlap.

    (doc_a, doc_b, shared, overlap) where overlap = shared / min(|selA|,
    |selB|) over the FULL (pre-cap) selected sets — the standard containment
    estimate; the winnowing guarantee makes any shared token run of
    >= k + w - 1 contribute at least one shared fingerprint.

    Plan: textstats.winnow_selected (narrow, zero-shuffle) → explode →
    fingerprint-frequency cap BEFORE the self-join (a fingerprint in d docs
    yields d(d-1)/2 pairs; boilerplate shingles are hubs exactly like
    gazetteer stopwords and LSH hot bands).  The cap is a COUNT WINDOW
    partitioned by fingerprint — one exchange on f, partition sizes bounded
    by the per-fingerprint doc frequency, and the subsequent self-join on f
    reuses the same hash partitioning (the distinct-fingerprint table is
    corpus-sized at 10^12 files, so a broadcast frequency dictionary is NOT
    viable here — unlike the per-source dictionaries in module_jaccard).
    Join keys are 32-char md5s, uniformly distributed — no skew beyond the
    capped hubs.

    The lazy localCheckpoint after winnow_selected is load-bearing:
    exploding the winnowing array DIRECTLY re-evaluates the nested
    higher-order-function chain (transform→slice→array_min over a
    transform→md5 array — all CodegenFallback) pathologically inside
    Generate, measured 30.5 s vs 0.67 s for one full evaluation of the
    same column at sf0.01; a plain repartition barrier does NOT stop the
    re-inlining. The checkpoint materializes one fingerprint array per
    doc (linear in corpus, the same pattern and cost class as
    doc_minhash_pairs' pre-self-join checkpoint) and is also what lets
    the a/b join sides share one evaluation.
    """
    from .textstats import winnow_selected

    sel = winnow_selected(df, k, w, text_col, id_col).localCheckpoint(
        eager=False)
    fp = sel.select(
        "doc_id", F.size("sel").cast("long").alias("n_sel"),
        F.explode("sel").alias("f"),
    )
    kept = (
        fp.withColumn("df_count", F.count("*").over(Window.partitionBy("f")))
        .where(F.col("df_count") <= cap)
        .drop("df_count")
    )
    a = kept.select(F.col("doc_id").alias("doc_a"),
                    F.col("n_sel").alias("sz_a"), "f")
    b = kept.select(F.col("doc_id").alias("doc_b"),
                    F.col("n_sel").alias("sz_b"), "f")
    return (
        a.join(b, "f")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"),
             F.min("sz_a").alias("sz_a"), F.min("sz_b").alias("sz_b"))
        .where(F.col("shared") >= min_shared)
        .select(
            "doc_a", "doc_b", "shared",
            F.round(F.col("shared") / F.least("sz_a", "sz_b"), 4)
            .alias("overlap"),
        )
    )


def top_symbols(symbols: DataFrame, k: int = 3) -> DataFrame:
    """Top-k most-defined symbols per (lang, kind) with deterministic
    tie-break on the symbol string; one agg shuffle + one bounded window
    (partition count = |langs|×|kinds|, rows per partition already reduced
    by the aggregate — no unpartitioned window)."""
    counts = symbols.groupBy("lang", "kind", "symbol").agg(
        F.count("*").alias("n_defs"))
    w = Window.partitionBy("lang", "kind").orderBy(
        F.col("n_defs").desc(), F.col("symbol"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
