"""Seeded-randomized property tests for the sketch/fingerprint guarantees.

Each property runs as ONE Spark job over a seeded random batch (per-example
Spark jobs would be minutes per property): the guarantee is asserted for
every generated case, and the generator is deterministic so failures
reproduce.
"""

import hashlib
import random
import string

from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)


def _rand_words(rng, n):
    return [
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 8)))
        for _ in range(n)
    ]


def test_winnow_guarantee_randomized(spark):
    """Docs sharing a >= k+w-1 token run share a fingerprint; Spark output
    equals the pure-python reference on every random doc."""
    from ht_ner_spark.operators.textstats import winnow_fingerprint

    rng = random.Random(1234)
    rows, shared_pairs = [], []
    for i in range(15):
        shared = _rand_words(rng, 6)            # k+w-1 = 6 token run
        a = _rand_words(rng, rng.randint(0, 8)) + shared + _rand_words(rng, 3)
        b = _rand_words(rng, 4) + shared + _rand_words(rng, rng.randint(0, 7))
        rows += [(2 * i, " ".join(a)), (2 * i + 1, " ".join(b))]
        shared_pairs.append((2 * i, 2 * i + 1))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in winnow_fingerprint(docs).collect()}

    def winnow_set(text, k=3, w=4):
        t = text.lower().split()
        gh = [hashlib.md5("\x1f".join(t[i:i + k]).encode()).hexdigest()
              for i in range(len(t) - k + 1)]
        return sorted({min(gh[i:i + w]) for i in range(len(gh) - w + 1)})

    ref = {d: winnow_set(t) for d, t in rows}
    for d, _ in rows:
        assert got[d]["fp_hash"] == hashlib.md5(
            ",".join(ref[d]).encode()).hexdigest(), d
        assert got[d]["n_selected"] == len(ref[d])
    for a, b in shared_pairs:
        assert set(ref[a]) & set(ref[b]), (a, b)


def test_cms_never_underestimates_randomized(spark):
    from ht_ner_spark.operators.textstats import cms_heavy_hitters

    rng = random.Random(99)
    vals = []
    for i in range(150):
        vals += [f"item-{i}"] * rng.randint(1, 40)
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    out = cms_heavy_hitters(df, "v", k=20).collect()
    assert len(out) == 20
    from collections import Counter
    exact = Counter(vals)
    for r in out:
        assert r["exact_n"] == exact[r["v"]]
        assert r["over"] >= 0, r                 # the CMS guarantee


def test_dedup_normalized_mutation_invariance(spark):
    """Case/punctuation/extra-space mutations never split a dedup group."""
    from ht_ner_spark.operators.dedup import dedup_normalized

    rng = random.Random(7)
    rows = []
    for i in range(25):
        base = " ".join(_rand_words(rng, rng.randint(3, 10)))
        mutated = base.upper().replace(" ", "  ") + rng.choice(["!", "...", "?!"])
        rows += [(2 * i, base), (2 * i + 1, mutated)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_normalized(docs).collect()}
    for i in range(25):
        assert out[2 * i + 1]["canon_id"] == out[2 * i]["canon_id"], i
        assert out[2 * i + 1]["is_dup"], i


def test_hll_error_bound_randomized(spark):
    """Relative error stays within ~4/sqrt(256)=0.25 (4 sigma) across
    seeded cardinalities spanning both estimator branches."""
    from ht_ner_spark.operators.textstats import hll_distinct

    rng = random.Random(5)
    rows = []
    for g, card in enumerate([10, 80, 400, 2000, 8000]):
        vals = [f"g{g}-v{i}" for i in range(card)]
        rows += [(f"g{g}", v) for v in vals]
        rows += [(f"g{g}", rng.choice(vals)) for _ in range(card // 2)]
    df = spark.createDataFrame(rows, "grp string, v string")
    out = hll_distinct(df, "grp", "v").collect()
    assert len(out) == 5
    for r in out:
        assert r["rel_err"] <= 0.25, (r["grp"], r["rel_err"])
