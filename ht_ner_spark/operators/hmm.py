"""A3: distributed HMM label aggregation (Baum-Welch EM over LF votes).

Reference: ``skweak.generative.HMM("hmm", labels=["PERSON_NAME"]).fit(docs)``
followed by per-doc posterior decoding
(/root/reference/sweet/run_sweet.py:60-65) — a corpus-global iterative EM over
every document's labeling-function span votes, the second global barrier of
the reference pipeline (SURVEY §3.1 step 7).

Spark shape (SURVEY §2.4 A3): the model is TINY (2 hidden states x |LFs|
Bernoulli emissions + 2x2 transitions); the data is huge. Each EM iteration:

1. broadcast current parameters into an ``applyInPandas`` grouped pass keyed
   by row_id (votes are already long-format (row_id, pos, lf_name, label));
2. per document: forward-backward over the token sequence, emitting the
   expected sufficient statistics (state occupancy per LF vote, transition
   counts) as a handful of rows;
3. one global ``groupBy().sum()`` (map-side partial agg — the only shuffle);
4. driver M-step on the ~4|LF|+6 aggregated numbers.

Determinism: init from LF-precision priors (no RNG); float sums are
aggregated in float64 and the M-step normalizes, so cross-partition addition
order only perturbs at 1e-15 — tests compare against a pure-Python oracle
with rtol=1e-6.

Hidden states: 0 = NOT_NAME, 1 = PERSON_NAME. Observations per token: the
set of LFs that voted PERSON_NAME (positive) or NOT_NAME (negative) there.
Emission model: per (state, lf) Bernoulli P(lf fires | state), with
PERSON_NAME-votes treated as evidence events and NOT_NAME-votes as anti
evidence events (mirrors skweak's treatment of antirules as negative
observations).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATS = StructType(
    [
        StructField("kind", StringType(), False),   # 'emit' | 'trans' | 'start'
        StructField("lf", StringType(), False),     # lf name or '' for trans
        StructField("state", IntegerType(), False),
        StructField("next_state", IntegerType(), False),  # trans only
        StructField("w", DoubleType(), False),      # expected count
        StructField("n", DoubleType(), False),      # exposure (denominator)
    ]
)

_DECODE = StructType(
    [
        StructField("row_id", LongType(), False),
        StructField("pos", IntegerType(), False),
        StructField("label", StringType(), False),
        StructField("score", DoubleType(), False),  # P(PERSON_NAME | obs)
        StructField("tok", StringType(), False),
    ]
)


class HMMParams:
    """start[2], trans[2][2], emit[state][lf] = P(lf votes | state)."""

    def __init__(self, lfs: list[str]):
        self.lfs = list(lfs)
        self.start = [0.9, 0.1]
        self.trans = [[0.9, 0.1], [0.5, 0.5]]
        # deterministic prior init (SURVEY §7.2.4): positive LFs are assumed
        # precise (fire far more often inside PERSON_NAME); frequency
        # antirules the opposite.
        self.emit = {}
        for lf in self.lfs:
            if lf.startswith("freq_") or lf.endswith("_anti"):
                self.emit[lf] = [0.6, 0.05]   # fires mostly in NOT_NAME state
            else:
                self.emit[lf] = [0.05, 0.8]   # fires mostly in PERSON_NAME

    def to_dict(self) -> dict:
        return {"lfs": self.lfs, "start": self.start, "trans": self.trans,
                "emit": self.emit}

    @classmethod
    def from_dict(cls, d: dict) -> "HMMParams":
        p = cls(d["lfs"])
        p.start = d["start"]
        p.trans = d["trans"]
        p.emit = d["emit"]
        return p


def _obs_matrix(grp: pd.DataFrame, n_toks: int, lfs: list[str]):
    """-> per-position dict {lf: +1 (PERSON vote) / -1 (NOT_NAME vote)}."""
    obs: list[dict] = [{} for _ in range(n_toks)]
    lf_set = frozenset(lfs)  # hoisted: the per-vote loop must be O(n_votes)
    for pos, lf, label in zip(grp["pos"], grp["lf_name"], grp["label"]):
        if 0 <= pos < n_toks and lf in lf_set:
            obs[int(pos)][lf] = 1 if label == "PERSON_NAME" else -1
    return obs


def _emission_matrix(params: HMMParams, obs: list[dict]) -> np.ndarray:
    """(n, 2) P(observed vote pattern at t | state) under independent
    Bernoulli LFs. Only OBSERVED LFs contribute (skweak-style partial
    observation: an LF that stays silent is uninformative, not negative
    evidence). NOT_NAME votes are evidence AGAINST state 1 — modelled as the
    LF's complementary event in the anti direction."""
    n = len(obs)
    em = np.ones((n, 2))
    for t, votes in enumerate(obs):
        for lf, sign in votes.items():
            e0, e1 = params.emit[lf]
            if sign > 0:
                em[t, 0] *= e0
                em[t, 1] *= e1
            else:
                em[t, 0] *= max(e0, 1e-6)
                em[t, 1] *= 1.0 - e1
    np.maximum(em, 1e-12, out=em)
    return em


def _forward_backward(params: HMMParams, obs: list[dict]):
    """Scaled forward-backward, numpy-vectorized over the 2 states; the
    per-position work is two 2-vector ops (the t-recursions are inherently
    sequential). Returns (gamma (n,2), (alpha, beta, em, scale), loglik)."""
    n = len(obs)
    if n == 0:
        return np.zeros((0, 2)), (None, None, None, None), 0.0
    em = _emission_matrix(params, obs)
    trans = np.asarray(params.trans)
    alpha = np.zeros((n, 2))
    scale = np.zeros(n)
    a = np.asarray(params.start) * em[0]
    scale[0] = a.sum() or 1e-12
    alpha[0] = a / scale[0]
    for t in range(1, n):
        a = em[t] * (alpha[t - 1] @ trans)
        scale[t] = a.sum() or 1e-12
        alpha[t] = a / scale[t]
    beta = np.ones((n, 2))
    for t in range(n - 2, -1, -1):
        beta[t] = (trans @ (em[t + 1] * beta[t + 1])) / scale[t + 1]
    g = alpha * beta
    z = g.sum(axis=1, keepdims=True)
    z[z == 0.0] = 1e-12
    gamma = g / z
    ll = float(np.log(scale).sum())
    return gamma, (alpha, beta, em, scale), ll


def _doc_stats(params: HMMParams, obs: list[dict]):
    """Expected sufficient statistics for one document, PRE-AGGREGATED
    within the doc (sums are associative — the global groupBy().sum() sees
    identical totals): O(|LFs observed| + 6) rows per doc instead of the
    O(4n) per-position rows of the naive form, which dominated shuffle
    volume for THE aggregation of the pipeline (VERDICT r1 wrong-#6)."""
    gamma, (alpha, beta, em, scale), _ll = _forward_backward(params, obs)
    n = len(obs)
    rows = []
    if n == 0:
        return rows
    for s in range(2):
        rows.append(("start", "", s, 0, float(gamma[0, s]), 1.0))
    if n > 1:
        trans = np.asarray(params.trans)
        # xi[s, u] summed over t: alpha[t,s]·trans[s,u]·em[t+1,u]·beta[t+1,u]/scale[t+1]
        right = em[1:] * beta[1:] / scale[1:, None]          # (n-1, 2) over u
        xi = (alpha[:-1].T @ right) * trans                  # (2, 2)
        gexp = gamma[:-1].sum(axis=0)                        # exposure per s
        for s in range(2):
            for u in range(2):
                rows.append(("trans", "", s, u, float(xi[s, u]), float(gexp[s])))
    # emissions: exposure = state occupancy at observed positions; event =
    # LF voted PERSON_NAME there
    emit_w: dict[str, np.ndarray] = {}
    emit_n: dict[str, np.ndarray] = {}
    for t, votes in enumerate(obs):
        for lf, sign in votes.items():
            nacc = emit_n.get(lf)
            if nacc is None:
                nacc = emit_n[lf] = np.zeros(2)
            nacc += gamma[t]
            if sign > 0:
                wacc = emit_w.get(lf)
                if wacc is None:
                    wacc = emit_w[lf] = np.zeros(2)
                wacc += gamma[t]
    for lf, nacc in emit_n.items():
        wacc = emit_w.get(lf)
        for s in range(2):
            rows.append(("emit", lf, s, 0,
                         float(wacc[s]) if wacc is not None else 0.0,
                         float(nacc[s])))
    return rows


def _votes_with_len(votes: DataFrame, doc_lens: DataFrame) -> DataFrame:
    return votes.join(doc_lens, "row_id", "inner")


def hmm_fit(votes: DataFrame, doc_lens: DataFrame, lfs: list[str] | None = None,
            n_iter: int = 5) -> HMMParams:
    """EM fit. ``doc_lens`` = (row_id, n_toks). Returns fitted params."""
    if lfs is None:
        lfs = sorted(
            r["lf_name"] for r in votes.select("lf_name").distinct().collect()
        )
    params = HMMParams(lfs)
    data = _votes_with_len(votes, doc_lens)

    for _ in range(n_iter):
        pd_params = params.to_dict()

        def stats(key, grp: pd.DataFrame) -> pd.DataFrame:
            p = HMMParams.from_dict(pd_params)
            n_toks = int(grp["n_toks"].iloc[0])
            obs = _obs_matrix(grp, n_toks, pd_params["lfs"])
            return pd.DataFrame(
                _doc_stats(p, obs),
                columns=["kind", "lf", "state", "next_state", "w", "n"],
            )

        agg = (
            data.groupBy("row_id").applyInPandas(stats, _STATS)
            .groupBy("kind", "lf", "state", "next_state")
            .agg(F.sum("w").alias("w"), F.sum("n").alias("n"))
            .collect()
        )
        # ---- driver M-step on the tiny aggregate
        start = [1e-6, 1e-6]
        trans_w = [[1e-6] * 2 for _ in range(2)]
        trans_n = [1e-6, 1e-6]
        emit_w = {lf: [1e-6, 1e-6] for lf in lfs}
        emit_n = {lf: [2e-6, 2e-6] for lf in lfs}
        for r in agg:
            if r["kind"] == "start":
                start[r["state"]] += r["w"]
            elif r["kind"] == "trans":
                trans_w[r["state"]][r["next_state"]] += r["w"]
                trans_n[r["state"]] += r["w"]
            else:
                emit_w[r["lf"]][r["state"]] += r["w"]
                emit_n[r["lf"]][r["state"]] += r["n"]
        z = sum(start)
        params.start = [s / z for s in start]
        params.trans = [
            [trans_w[s][u] / trans_n[s] for u in range(2)] for s in range(2)
        ]
        params.emit = {
            lf: [min(max(emit_w[lf][s] / emit_n[lf][s], 1e-6), 1 - 1e-6)
                 for s in range(2)]
            for lf in lfs
        }
    return params


def hmm_decode(votes: DataFrame, doc_lens: DataFrame, params: HMMParams) -> DataFrame:
    """Posterior decode -> (row_id, pos, label, score, tok) at voted
    positions (positions with no votes have uniform-prior posteriors and are
    never PERSON_NAME under the reference's projection, which only keeps
    HMM spans seeded by some LF — run_sweet.py:69-70,77-89)."""
    pd_params = params.to_dict()
    data = _votes_with_len(votes, doc_lens)

    def decode(key, grp: pd.DataFrame) -> pd.DataFrame:
        p = HMMParams.from_dict(pd_params)
        row_id = int(grp["row_id"].iloc[0])
        n_toks = int(grp["n_toks"].iloc[0])
        obs = _obs_matrix(grp, n_toks, pd_params["lfs"])
        gamma, _, _ = _forward_backward(p, obs)
        toks = {}
        for pos, tok in zip(grp["pos"], grp["tok"]):
            toks.setdefault(int(pos), tok)
        rows = []
        for t in range(n_toks):
            if obs[t]:
                post1 = gamma[t][1]
                rows.append(
                    (row_id, t,
                     "PERSON_NAME" if post1 > 0.5 else "NOT_NAME",
                     post1, toks.get(t, ""))
                )
        return pd.DataFrame(
            rows, columns=["row_id", "pos", "label", "score", "tok"]
        )

    return data.groupBy("row_id").applyInPandas(decode, _DECODE)
