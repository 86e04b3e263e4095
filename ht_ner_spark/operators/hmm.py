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

import math
from typing import Iterator

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
    for pos, lf, label in zip(grp["pos"], grp["lf_name"], grp["label"]):
        if 0 <= pos < n_toks and lf in set(lfs):
            obs[int(pos)][lf] = 1 if label == "PERSON_NAME" else -1
    return obs


def _emit_prob(params: HMMParams, state: int, votes: dict) -> float:
    """P(observed vote pattern | state) under independent Bernoulli LFs.
    Only OBSERVED LFs contribute (skweak-style partial observation: an LF
    that stays silent is uninformative, not negative evidence)."""
    p = 1.0
    for lf, sign in votes.items():
        e = params.emit[lf][state]
        if sign > 0:
            p *= e            # LF voted PERSON_NAME here
        else:
            # NOT_NAME vote: evidence AGAINST state 1 — model as the LF's
            # complementary event in the anti direction
            p *= (1.0 - e) if state == 1 else max(e, 1e-6)
    return max(p, 1e-12)


def _forward_backward(params: HMMParams, obs: list[dict]):
    n = len(obs)
    if n == 0:
        return [], [], 0.0
    S = 2
    em = [[_emit_prob(params, s, obs[t]) for s in range(S)] for t in range(n)]
    alpha = [[0.0] * S for _ in range(n)]
    scale = [0.0] * n
    for s in range(S):
        alpha[0][s] = params.start[s] * em[0][s]
    scale[0] = sum(alpha[0]) or 1e-12
    alpha[0] = [a / scale[0] for a in alpha[0]]
    for t in range(1, n):
        for s in range(S):
            alpha[t][s] = em[t][s] * sum(
                alpha[t - 1][u] * params.trans[u][s] for u in range(S)
            )
        scale[t] = sum(alpha[t]) or 1e-12
        alpha[t] = [a / scale[t] for a in alpha[t]]
    beta = [[1.0] * S for _ in range(n)]
    for t in range(n - 2, -1, -1):
        for s in range(S):
            beta[t][s] = sum(
                params.trans[s][u] * em[t + 1][u] * beta[t + 1][u] for u in range(S)
            ) / scale[t + 1]
    gamma = []
    for t in range(n):
        g = [alpha[t][s] * beta[t][s] for s in range(S)]
        z = sum(g) or 1e-12
        gamma.append([x / z for x in g])
    ll = sum(math.log(s) for s in scale)
    return gamma, (alpha, beta, em, scale), ll


def _doc_stats(params: HMMParams, obs: list[dict]):
    """Expected sufficient statistics rows for one document."""
    gamma, (alpha, beta, em, scale), ll = _forward_backward(params, obs)
    n = len(obs)
    rows = []
    if n == 0:
        return rows
    S = 2
    for s in range(S):
        rows.append(("start", "", s, 0, gamma[0][s], 1.0))
    # transitions
    for t in range(n - 1):
        for s in range(S):
            for u in range(S):
                xi = (alpha[t][s] * params.trans[s][u] * em[t + 1][u]
                      * beta[t + 1][u] / scale[t + 1])
                rows.append(("trans", "", s, u, xi, gamma[t][s]))
    # emissions: exposure = state occupancy; event = LF voted PERSON there
    for t in range(n):
        for lf, sign in obs[t].items():
            for s in range(S):
                rows.append(("emit", lf, s, 0,
                             gamma[t][s] if sign > 0 else 0.0, gamma[t][s]))
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
