"""Planted-fixture semantics for the round-3 curation additions:
span-level exact-substring dedup, PII scrub, temperature mixing, SemDeDup.
(The contract test cross-checks each against its DuckDB oracle at sf0.01;
these pin the operator semantics by hand on tiny planted inputs.)"""

from pyspark.sql import functions as F

from ht_ner_spark.operators.dedup import span_dedup_stats
from ht_ner_spark.operators.packing import temperature_mix
from ht_ner_spark.operators.pii import pii_scrub
from ht_ner_spark.operators.similarity import seed_centroids, semantic_dedup


def test_span_dedup_planted(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),          # 2 4-grams, both first occurrences
            (1, "a b c d x"),          # 'a b c d' duplicates doc 0
            (2, "a b c d e"),          # both spans duplicate doc 0
            (3, "q r s"),              # < 4 tokens: no spans, absent
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup_stats(docs, n=4).collect()}
    assert set(out) == {0, 1, 2}
    assert (out[0]["total_spans"], out[0]["dup_spans"]) == (2, 0)
    assert (out[1]["total_spans"], out[1]["dup_spans"]) == (2, 1)
    assert (out[2]["total_spans"], out[2]["dup_spans"]) == (2, 2)
    assert out[2]["dup_frac"] == 1.0


def test_span_dedup_counts_instances_not_distinct(spark):
    # a doc that repeats an earlier doc's span 3x contributes 3 dup spans
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c d a b c d a b c d")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup_stats(docs, n=4).collect()}
    assert out[1]["total_spans"] == 9
    # every 4-gram of doc 1 is built from the doc-0 alphabet; the ones equal
    # to 'a b c d' (positions 0,4,8) plus rotations never seen in doc 0
    assert out[1]["dup_spans"] == 3


def test_pii_scrub_planted(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail me at jo.doe+x@sub.example.org today"),
            (1, "server 10.0.255.7 and backup 192.168.1.300"),
            (2, "call 555-867-5309 or 123-456-7890 x99"),
            (3, "clean text with no pii at all"),
            (4, "mixed a@b.io at 1.2.3.4 call 999-888-7777"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (1, 0, 0)
    assert "<EMAIL>" in out[0]["clean_text"]
    assert "jo.doe" not in out[0]["clean_text"]
    # 192.168.1.300: trailing octet '300' still matches \d{1,3} on '300'?
    # no — 300 is three digits, \d{1,3} matches it; both engines agree.
    assert out[1]["n_ipv4"] == 2
    assert (out[2]["n_phone"], out[2]["n_email"]) == (2, 0)
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 0)
    assert out[3]["clean_text"] == "clean text with no pii at all"
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (1, 1, 1)
    assert out[4]["clean_text"] == "mixed <EMAIL> at <IP> call <PHONE>"


def test_temperature_mix_flattens(spark):
    # temperature sampling must UPWEIGHT the small source relative to its
    # token share: 10000 vs 100 tokens -> raw share 0.99, sqrt share ~0.909
    docs = spark.createDataFrame(
        [(i, "w " * 100, "big") for i in range(100)]
        + [(1000, "w " * 100, "small")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in
           temperature_mix(docs, alpha=0.5, budget_tokens=1000).collect()}
    big, small = out["big"], out["small"]
    raw_share = big["n_tokens"] / (big["n_tokens"] + small["n_tokens"])
    assert big["weight"] < raw_share
    assert abs(big["weight"] + small["weight"] - 1.0) < 1e-6
    # epochs = budget_share / n_tokens: the small source gets repeated more
    assert small["epochs"] > big["epochs"]


def test_lm_perplexity_planted(spark):
    import math

    from ht_ner_spark.operators.textstats import lm_perplexity

    # corpus: 'a' x3, 'b' x1 -> T=4, V=2; p(a)=(3+1)/6, p(b)=(1+1)/6
    docs = spark.createDataFrame(
        [(0, "a a a"), (1, "b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in lm_perplexity(docs).collect()}
    nll_a, nll_b = -math.log(4 / 6), -math.log(2 / 6)
    assert out[0]["n_tokens"] == 3 and out[1]["n_tokens"] == 1
    assert abs(out[0]["avg_nll"] - nll_a) < 1e-3
    assert abs(out[1]["avg_nll"] - nll_b) < 1e-3
    # rarer doc must score HIGHER perplexity (the CCNet gate's direction)
    assert out[1]["ppl"] > out[0]["ppl"]
    assert abs(out[0]["ppl"] - math.exp(nll_a)) < 1e-2


def test_semantic_dedup_planted(spark):
    # 2 medoid cells (vec_id 0 and 1). Vectors 2,3 near vector 0's cell:
    # 2 is a near-dup of 0 (cos=1), 3 is orthogonal to both.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0, 0.0]),     # same direction as 0 -> dup_of 0
        (3, [0.9, 0.0, 0.1, 0.0]),     # cell 0, cos(3,0)=0.994 -> dup
        (4, [0.0, 3.0, 0.0, 0.0]),     # cell 1, dup of 1
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = seed_centroids(vecs, n_cells=2)
    out = {r["vec_id"]: r for r in
           semantic_dedup(vecs, cents, tau=0.95).collect()}
    assert not out[0]["is_dup"] and not out[1]["is_dup"]
    assert out[2]["is_dup"] and out[2]["dup_of"] == 0
    assert out[3]["is_dup"] and out[3]["dup_of"] == 0
    assert out[4]["is_dup"] and out[4]["dup_of"] == 1
    assert out[2]["cell"] == 0 and out[4]["cell"] == 1


def test_dsir_weights_planted(spark):
    import math

    from ht_ner_spark.operators.textstats import dsir_weights

    docs = spark.createDataFrame(
        [(0, "x x"), (1, "y y"), (2, "x y")], "doc_id long, text string"
    )
    target = docs.where("doc_id = 0")
    out = {r["doc_id"]: r for r in dsir_weights(docs, target).collect()}
    # target LM: x:2 (Tt=2); source LM: x:3, y:3 (Ts=6); joint V=2
    lx = math.log((2 + 1) / (2 + 2)) - math.log((3 + 1) / (6 + 2))
    ly = math.log((0 + 1) / (2 + 2)) - math.log((3 + 1) / (6 + 2))
    assert abs(out[0]["llr"] - 2 * lx) < 1e-3      # target-like doc scores up
    assert abs(out[1]["llr"] - 2 * ly) < 1e-3      # off-domain doc scores down
    assert abs(out[2]["avg_llr"] - (lx + ly) / 2) < 1e-3
    assert out[0]["llr"] > out[2]["llr"] > out[1]["llr"]


def test_chunk_documents_planted(spark):
    from ht_ner_spark.operators.indexing import chunk_documents

    # 10 tokens, chunk_size=4, overlap=1 -> step 3 -> starts 0,3,6,9
    docs = spark.createDataFrame(
        [(7, "a b c d e f g h i j"), (8, "  "), (9, "x")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_size=4, overlap=1).collect()
    by = {(r["doc_id"], r["chunk_id"]): r for r in out}
    assert {k[0] for k in by} == {7, 9}           # all-whitespace doc dropped
    assert [by[(7, i)]["start"] for i in range(4)] == [0, 3, 6, 9]
    assert [by[(7, i)]["n_tokens"] for i in range(4)] == [4, 4, 4, 1]
    assert by[(9, 0)]["n_tokens"] == 1 and len(by) == 5
    import hashlib
    assert by[(7, 1)]["chunk_hash"] == hashlib.md5(
        "\x1f".join(["d", "e", "f", "g"]).encode()).hexdigest()


def test_inverted_index_planted(spark):
    from ht_ner_spark.operators.indexing import inverted_index

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "dog"), (3, "cat fish"), (4, "dog dog")],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in inverted_index(docs, postings_cap=2).collect()}
    assert out["cat"]["df"] == 2 and out["cat"]["total_tf"] == 3
    assert out["dog"]["df"] == 3 and out["dog"]["total_tf"] == 4
    assert out["dog"]["postings"] == [1, 2]       # capped at 2, ascending
    assert out["fish"]["postings"] == [3]


def test_quality_deciles_planted(spark):
    from ht_ner_spark.operators.textstats import quality_deciles

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * (1 + i % 3),
          "en", "web", 0) for i in range(23)]
        + [(100 + i, "word " * 30, "en", "books", 0) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = quality_deciles(docs).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert sum(r["n_docs"] for r in by_src["web"]) == 23
    assert sum(r["n_docs"] for r in by_src["books"]) == 4
    # ntile balance: group sizes differ by at most 1 within a source
    sizes = [r["n_docs"] for r in by_src["web"]]
    assert max(sizes) - min(sizes) <= 1
    # cutoffs are monotone across deciles
    web = sorted(by_src["web"], key=lambda r: r["decile"])
    for a, b in zip(web, web[1:]):
        assert a["max_score"] <= b["min_score"] + 1e-9


def test_boilerplate_lines_planted(spark):
    import hashlib

    from ht_ner_spark.operators.dedup import boilerplate_lines

    banner = "COOKIE BANNER ACCEPT ALL"
    docs = spark.createDataFrame(
        [(i, f"{banner}\nunique body {i} with words\nok", "web")
         for i in range(3)]
        + [(9, f"{banner}\nsolo body here today", "blogs")],
        "doc_id long, text string, source string",
    )
    out = {r["doc_id"]: r for r in boilerplate_lines(docs, min_df=3).collect()}
    # banner repeats in 3 web docs -> boiler there; 'ok' is short-exempt
    for i in range(3):
        assert out[i]["n_lines"] == 3 and out[i]["n_boiler"] == 1
        want = f"unique body {i} with words\nok"
        assert out[i]["clean_hash"] == hashlib.md5(want.encode()).hexdigest()
    # same banner in a DIFFERENT source with df=1 is NOT boilerplate
    assert out[9]["n_boiler"] == 0


def test_trending_event_types_planted(spark):
    from datetime import datetime

    from ht_ner_spark.operators.eventstats import trending_event_types

    def t(h, m):
        return datetime(2024, 1, 1, h, m)

    ev = spark.createDataFrame(
        [(t(0, 1), "click"), (t(0, 2), "click"), (t(0, 3), "view"),
         (t(1, 1), "click"), (t(1, 2), "view"), (t(1, 3), "view"),
         (t(1, 4), "view")],
        "ts timestamp, event_type string",
    )
    out = {(r["win_us"], r["event_type"]): r
           for r in trending_event_types(ev, k=2).collect()}
    h0 = int(datetime(2024, 1, 1).timestamp()) * 1_000_000
    h1 = h0 + 3_600_000_000
    assert out[(h0, "click")]["rnk"] == 1 and out[(h0, "click")]["cnt"] == 2
    assert out[(h0, "click")]["delta"] == 2          # no previous window
    assert out[(h1, "view")]["rnk"] == 1 and out[(h1, "view")]["cnt"] == 3
    assert out[(h1, "view")]["delta"] == 2           # 3 vs 1 in hour 0
    assert out[(h1, "click")]["delta"] == -1         # 1 vs 2 in hour 0


def test_props_profile_planted(spark):
    from ht_ner_spark.operators.eventstats import props_profile

    ev = spark.createDataFrame(
        [("click", '{"k": 3}', 1.5), ("click", '{"x": 9}', 2.5),
         ("view", "not json", 4.0), ("view", '{"k": 7}', 6.0)],
        "event_type string, props string, value double",
    )
    out = {r["event_type"]: r for r in props_profile(ev).collect()}
    assert out["click"]["n_events"] == 2 and out["click"]["n_with_key"] == 1
    assert out["click"]["sum_key"] == 3 and out["click"]["avg_value"] == 2.0
    assert out["view"]["n_with_key"] == 1 and out["view"]["sum_key"] == 7
    assert out["view"]["avg_value"] == 5.0


def test_winnow_fingerprint_planted(spark):
    import hashlib

    from ht_ner_spark.operators.textstats import winnow_fingerprint

    # the winnowing guarantee: docs sharing a run of >= k+w-1 tokens share
    # at least one selected fingerprint
    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(0, "intro words here " + shared),
         (1, shared + " totally different tail text"),
         (2, "unrelated content with many other tokens present"),
         (3, "too short")],
        "doc_id long, text string",
    )
    rows = winnow_fingerprint(docs).collect()
    by = {r["doc_id"]: r for r in rows}
    assert 3 not in by                         # < k+w-1 tokens -> filtered
    assert by[0]["n_grams"] == 9 - 2           # n - k + 1

    # recompute doc 0/1 selected sets in pure python and check overlap
    def winnow(text, k=3, w=4):
        t = text.lower().split()
        gh = [hashlib.md5("\x1f".join(t[i:i + k]).encode()).hexdigest()
              for i in range(len(t) - k + 1)]
        return sorted({min(gh[i:i + w]) for i in range(len(gh) - w + 1)})

    s0, s1 = winnow(docs.collect()[0]["text"]), winnow(docs.collect()[1]["text"])
    assert set(s0) & set(s1), "shared run must share a fingerprint"
    assert by[0]["fp_hash"] == hashlib.md5(",".join(s0).encode()).hexdigest()
    assert by[1]["fp_hash"] == hashlib.md5(",".join(s1).encode()).hexdigest()
    assert by[0]["n_selected"] == len(s0)


def test_dedup_normalized_planted(spark):
    from ht_ner_spark.operators.dedup import dedup_normalized

    docs = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "HELLO WORLD."),
         (4, "different text entirely")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_normalized(docs).collect()}
    assert out[1]["canon_id"] == 1 and not out[1]["is_dup"]
    assert out[2]["canon_id"] == 1 and out[2]["is_dup"]
    assert out[3]["canon_id"] == 1 and out[3]["is_dup"]
    assert out[4]["canon_id"] == 4 and not out[4]["is_dup"]


def test_hll_distinct_accuracy(spark):
    from ht_ner_spark.operators.textstats import hll_distinct

    # 5000 distinct values in one group, 30 in another (exercises both the
    # raw-estimate and linear-counting branches); p=8 -> ~6.5% typical err
    rows = [("big", f"value-{i}") for i in range(5000)] * 2
    rows += [("small", f"v{i % 30}") for i in range(300)]
    df = spark.createDataFrame(rows, "grp string, v string")
    out = {r["grp"]: r for r in hll_distinct(df, "grp", "v").collect()}
    assert out["big"]["exact_distinct"] == 5000
    assert out["big"]["rel_err"] < 0.15          # 3 sigma at p=8
    assert out["small"]["exact_distinct"] == 30
    assert out["small"]["rel_err"] < 0.25        # linear-counting regime
    # determinism: same input -> bit-identical estimate
    again = {r["grp"]: r["hll_estimate"]
             for r in hll_distinct(df, "grp", "v").collect()}
    assert again["big"] == out["big"]["hll_estimate"]


def test_cms_heavy_hitters_planted(spark):
    from ht_ner_spark.operators.textstats import cms_heavy_hitters

    rows = [("hot",)] * 500 + [("warm",)] * 100 \
        + [(f"cold-{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string")
    out = {r["v"]: r for r in cms_heavy_hitters(df, "v", k=2).collect()}
    assert set(out) == {"hot", "warm"}           # exact top-2 probes
    assert out["hot"]["exact_n"] == 500 and out["warm"]["exact_n"] == 100
    # the CMS invariant: never underestimates
    assert all(r["over"] >= 0 for r in out.values())
    # w=256, 800 items -> expected collision mass per cell ~3; generous cap
    assert all(r["over"] <= 50 for r in out.values())


def test_cohort_and_funnel_planted(spark):
    from datetime import datetime

    from ht_ner_spark.operators.eventstats import cohort_retention, funnel

    def t(d, h=0):
        return datetime(2024, 1, d, h)

    ev = spark.createDataFrame(
        # u1: full funnel in order across day 1-2; active days 1,2
        [(1, t(1, 1), "signup"), (1, t(1, 2), "view"), (1, t(2, 1), "click"),
         (1, t(2, 2), "purchase"),
         # u2: signs up day 1, views day 1, never clicks; active day 1 only
         (2, t(1, 3), "signup"), (2, t(1, 4), "view"),
         # u3: first seen day 2, purchase BEFORE signup (order violated)
         (3, t(2, 1), "purchase"), (3, t(2, 3), "signup"), (3, t(2, 4), "view"),
         (3, t(2, 5), "click")],
        "user_id long, ts timestamp, event_type string",
    )
    ret = {(r["cohort_day"], r["day_offset"]): r
           for r in cohort_retention(ev).collect()}
    d1 = (datetime(2024, 1, 1) - datetime(1970, 1, 1)).days
    assert ret[(d1, 0)]["cohort_size"] == 2 and ret[(d1, 0)]["n_active"] == 2
    assert ret[(d1, 1)]["n_active"] == 1 and ret[(d1, 1)]["retention"] == 0.5
    assert ret[(d1 + 1, 0)]["cohort_size"] == 1

    fun = {r["step"]: r for r in funnel(ev).collect()}
    assert fun[1]["n_users"] == 3                  # all signed up
    assert fun[2]["n_users"] == 3                  # all viewed after signup
    assert fun[3]["n_users"] == 2                  # u1, u3 clicked after view
    assert fun[4]["n_users"] == 1                  # only u1 purchased AFTER
    assert fun[4]["conv_rate"] == 0.3333

    # NULL-timestamp events must be inert (r4 review): a NULL-ts signup
    # sorts first and, unguarded, would pin t=NULL at k=0 and block every
    # later step (us > NULL is NULL) — diverging from the SQL oracle's
    # min-ignores-NULLs semantics. u4 must still complete step 2 off the
    # valid signup, and u5 (only NULL-ts events) must count nowhere.
    ev_null = spark.createDataFrame(
        [(4, None, "signup"), (4, t(1, 1), "signup"), (4, t(1, 2), "view"),
         (5, None, "signup")],
        "user_id long, ts timestamp, event_type string",
    )
    fn = {r["step"]: r["n_users"] for r in funnel(ev_null).collect()}
    assert fn[1] == 1 and fn[2] == 1 and fn[3] == 0


def test_bloom_screen_planted(spark):
    from ht_ner_spark.operators.textstats import bloom_screen

    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        # doc 1 contains the eval 4-gram "the quick brown fox"; doc 2 none
        [(1, "well the quick brown fox ran away"),
         (2, "completely unrelated words in this document here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bloom_screen(corpus, ev, n=4).collect()}
    assert out[1]["true_hits"] >= 1
    # Bloom guarantee: NO false negatives
    assert out[1]["bloom_hits"] >= out[1]["true_hits"]
    assert all(r["false_pos"] >= 0 for r in out.values())
    assert out[2]["true_hits"] == 0


def test_bm25_and_rrf_planted(spark):
    import math

    from ht_ner_spark.operators.textstats import bm25_topk, rrf_fusion

    docs = spark.createDataFrame(
        [(1, "spark spark spark filler words here"),
         (2, "spark appears once in a much longer document " + "pad " * 20),
         (3, "no query terms at all in this one"),
         (4, "window window spark")],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["spark", "window"], k=10).collect()
    ranks = {r["doc_id"]: r["rank"] for r in out}
    assert 3 not in ranks                      # no query terms -> no score
    assert ranks[4] == 1                       # two terms, short doc
    # doc 1 (tf=3, short) beats doc 2 (tf=1, long): tf saturation + length norm
    assert ranks[1] < ranks[2]
    # verify doc 2's score against hand BM25 (single term, Lucene idf)
    r2 = {r["doc_id"]: r["score"] for r in out}[2]
    n, df_t, tf, dl = 4, 3, 1, 28
    avgdl = (6 + 28 + 8 + 3) / 4
    idf = math.log((n - df_t + 0.5) / (df_t + 0.5) + 1)
    want = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert abs(r2 - want) < 1e-3

    fused = {r["doc_id"]: r for r in
             rrf_fusion(docs, ["spark", "window"], k=10).collect()}
    assert 3 not in fused
    # every fused doc has rrf = 1/(60+bm25) + 1/(60+tf_rank)
    for d, r in fused.items():
        want = 1 / (60 + r["bm25_rank"]) + 1 / (60 + r["tf_rank"])
        assert abs(r["rrf"] - want) < 1e-5, d
