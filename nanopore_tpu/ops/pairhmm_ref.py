"""NumPy log-space oracle for the five-state pair-HMM.

Unbanded O(m*n*S^2) forward/backward/posterior/EM-expectation reference
implementation used ONLY by tests to validate the banded TPU kernel
(nanopore_tpu.ops.pairhmm).  This is the semantic specification of the
pair-HMM that replaces the reference pipeline's ``cactus_realign`` /
``cactus_expectationMaximisation`` C core (invoked at
/root/reference/nanopore/analyses/utils.py:587,528).

Model conventions (see nanopore_tpu.align.model for state order):
- x = reference sequence (length n, consumed by match + delete states),
- y = read sequence (length m, consumed by match + insert states),
- DP cell (i, j) = (read consumed, ref consumed), i in [0,m], j in [0,n],
- start distribution uniform (1/5) over states at (0,0),
- likelihood = sum of state probabilities at (m, n) (unit end weights).

N (code 4) handling: emissions involving an unknown base marginalise the
emission table uniformly (expected emission under a uniform true base).
"""

from __future__ import annotations

import numpy as np
from dataclasses import dataclass

from nanopore_tpu.align.model import (
    PairHmmModel,
    NUM_STATES,
    MATCH,
    DELETE_STATES,
    INSERT_STATES,
)

NEG_INF = -1e30


@dataclass
class PairHmmParams:
    """Dense parameter tables consumed by both the oracle and the kernel.

    log_t:       (5, 5) log transitions [from, to]
    log_e_match: (5, 5) log match emissions [xcode, ycode] incl. N row/col
    log_e_gap:   (5, 5) log per-state single-base emissions [state, base]
                 (delete states emit the ref base, insert states the read
                 base; match row unused), incl. N column
    """

    log_t: np.ndarray
    log_e_match: np.ndarray
    log_e_gap: np.ndarray

    @staticmethod
    def from_model(model: PairHmmModel) -> "PairHmmParams":
        with np.errstate(divide="ignore"):
            t = np.log(np.maximum(model.transitions, 0.0))
            match = model.match_emissions()  # (4,4)
            e_match = np.full((5, 5), 0.0)
            e_match[:4, :4] = match
            e_match[4, :4] = match.mean(axis=0)
            e_match[:4, 4] = match.mean(axis=1)
            e_match[4, 4] = match.mean()
            gap = model.gap_emissions()  # (5,4)
            e_gap = np.zeros((5, 5))
            e_gap[:, :4] = gap
            e_gap[:, 4] = gap.mean(axis=1)
            return PairHmmParams(
                log_t=np.where(np.isfinite(t), t, NEG_INF),
                log_e_match=np.where(e_match > 0, np.log(np.maximum(e_match, 1e-300)), NEG_INF),
                log_e_gap=np.where(e_gap > 0, np.log(np.maximum(e_gap, 1e-300)), NEG_INF),
            )


def _lse(a: np.ndarray, axis=None) -> np.ndarray:
    m = np.max(a, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    out = np.log(np.sum(np.exp(a - m), axis=axis)) + np.squeeze(m, axis=axis)
    return out


def forward_full(xc: np.ndarray, yc: np.ndarray, p: PairHmmParams) -> tuple[np.ndarray, float]:
    """Log-space forward lattice.  Returns (f[(m+1),(n+1),5], log-likelihood)."""
    n, m = len(xc), len(yc)
    f = np.full((m + 1, n + 1, NUM_STATES), NEG_INF)
    f[0, 0] = np.log(1.0 / NUM_STATES)
    for i in range(m + 1):
        for j in range(n + 1):
            if i == 0 and j == 0:
                continue
            acc = np.full(NUM_STATES, NEG_INF)
            if i > 0 and j > 0:
                acc[MATCH] = p.log_e_match[xc[j - 1], yc[i - 1]] + _lse(
                    f[i - 1, j - 1] + p.log_t[:, MATCH]
                )
            for s in DELETE_STATES:
                if j > 0:
                    acc[s] = p.log_e_gap[s, xc[j - 1]] + _lse(
                        f[i, j - 1] + p.log_t[:, s]
                    )
            for s in INSERT_STATES:
                if i > 0:
                    acc[s] = p.log_e_gap[s, yc[i - 1]] + _lse(
                        f[i - 1, j] + p.log_t[:, s]
                    )
            f[i, j] = acc
    return f, float(_lse(f[m, n], axis=0))


def backward_full(xc: np.ndarray, yc: np.ndarray, p: PairHmmParams) -> np.ndarray:
    """Log-space backward lattice b[(m+1),(n+1),5]."""
    n, m = len(xc), len(yc)
    b = np.full((m + 1, n + 1, NUM_STATES), NEG_INF)
    b[m, n] = 0.0
    for i in range(m, -1, -1):
        for j in range(n, -1, -1):
            if i == m and j == n:
                continue
            terms = []
            if i < m and j < n:
                terms.append(
                    p.log_t[:, MATCH]
                    + p.log_e_match[xc[j], yc[i]]
                    + b[i + 1, j + 1, MATCH]
                )
            for s in DELETE_STATES:
                if j < n:
                    terms.append(
                        p.log_t[:, s] + p.log_e_gap[s, xc[j]] + b[i, j + 1, s]
                    )
            for s in INSERT_STATES:
                if i < m:
                    terms.append(
                        p.log_t[:, s] + p.log_e_gap[s, yc[i]] + b[i + 1, j, s]
                    )
            b[i, j] = _lse(np.stack(terms, axis=0), axis=0)
    return b


def posterior_match_full(
    xc: np.ndarray, yc: np.ndarray, p: PairHmmParams
) -> tuple[np.ndarray, float]:
    """Posterior aligned-pair probabilities.

    Returns (gamma[(m),(n)], loglik) where gamma[i-1, j-1] = P(read base
    i-1 aligned to ref base j-1) = P(match state at cell (i, j)).
    """
    f, loglik = forward_full(xc, yc, p)
    b = backward_full(xc, yc, p)
    g = f[1:, 1:, MATCH] + b[1:, 1:, MATCH] - loglik
    return np.exp(np.clip(g, -700, 50)), loglik


def em_expectations_full(
    xc: np.ndarray, yc: np.ndarray, p: PairHmmParams
) -> tuple[np.ndarray, np.ndarray, float]:
    """Baum-Welch expected transition / emission counts for one pair.

    Returns (trans_counts (5,5), emis_counts (5,16), loglik).  Emission
    counts for gap states spread the single consumed base uniformly over
    the unconstrained axis (they are flattened after EM anyway,
    reference utils.py:533-538).  Pairs involving N contribute no
    emission counts.
    """
    n, m = len(xc), len(yc)
    f, loglik = forward_full(xc, yc, p)
    b = backward_full(xc, yc, p)
    trans = np.zeros((NUM_STATES, NUM_STATES))
    emis = np.zeros((NUM_STATES, 16))
    for i in range(m + 1):
        for j in range(n + 1):
            # transitions out of (i, j) into each destination cell
            if i < m and j < n:
                w = np.exp(
                    f[i, j]
                    + p.log_t[:, MATCH]
                    + p.log_e_match[xc[j], yc[i]]
                    + b[i + 1, j + 1, MATCH]
                    - loglik
                )
                trans[:, MATCH] += w
            for s in DELETE_STATES:
                if j < n:
                    w = np.exp(
                        f[i, j]
                        + p.log_t[:, s]
                        + p.log_e_gap[s, xc[j]]
                        + b[i, j + 1, s]
                        - loglik
                    )
                    trans[:, s] += w
            for s in INSERT_STATES:
                if i < m:
                    w = np.exp(
                        f[i, j]
                        + p.log_t[:, s]
                        + p.log_e_gap[s, yc[i]]
                        + b[i + 1, j, s]
                        - loglik
                    )
                    trans[:, s] += w
            # emission occupancy of (i, j)
            gamma = np.exp(f[i, j] + b[i, j] - loglik)
            if i > 0 and j > 0 and xc[j - 1] < 4 and yc[i - 1] < 4:
                emis[MATCH, xc[j - 1] * 4 + yc[i - 1]] += gamma[MATCH]
            for s in DELETE_STATES:
                if j > 0 and xc[j - 1] < 4:
                    emis[s, xc[j - 1] * 4 : xc[j - 1] * 4 + 4] += gamma[s] / 4.0
            for s in INSERT_STATES:
                if i > 0 and yc[i - 1] < 4:
                    emis[s, yc[i - 1] :: 4] += gamma[s] / 4.0
    return trans, emis, loglik


def viterbi_full(
    xc: np.ndarray, yc: np.ndarray, p: PairHmmParams
) -> tuple[float, list[tuple[int, int]]]:
    """Unbanded log-space Viterbi: best state path -> (score, SAM cigar).

    Max-product analogue of forward_full; the semantic specification for
    the banded TPU Viterbi decode (nanopore_tpu.ops.viterbi), which is
    the fast-mapper extension stage standing in for the reference's
    non-probabilistic aligners (bwa/last/lastz/blasr extension).
    """
    from nanopore_tpu.io.sam import CIG

    n, m = len(xc), len(yc)
    v = np.full((m + 1, n + 1, NUM_STATES), NEG_INF)
    bp = np.zeros((m + 1, n + 1, NUM_STATES), np.int8)
    v[0, 0] = np.log(1.0 / NUM_STATES)
    for i in range(m + 1):
        for j in range(n + 1):
            if i == 0 and j == 0:
                continue
            for s in range(NUM_STATES):
                if s == MATCH:
                    if i == 0 or j == 0:
                        continue
                    cand = v[i - 1, j - 1] + p.log_t[:, s]
                    emit = p.log_e_match[xc[j - 1], yc[i - 1]]
                elif s in DELETE_STATES:
                    if j == 0:
                        continue
                    cand = v[i, j - 1] + p.log_t[:, s]
                    emit = p.log_e_gap[s, xc[j - 1]]
                else:
                    if i == 0:
                        continue
                    cand = v[i - 1, j] + p.log_t[:, s]
                    emit = p.log_e_gap[s, yc[i - 1]]
                bp[i, j, s] = int(np.argmax(cand))
                v[i, j, s] = emit + cand[bp[i, j, s]]
    s = int(np.argmax(v[m, n]))
    score = float(v[m, n, s])
    ops: list[int] = []
    i, j = m, n
    while i > 0 or j > 0:
        prev = int(bp[i, j, s])
        if s == MATCH:
            ops.append(CIG.M)
            i, j = i - 1, j - 1
        elif s in DELETE_STATES:
            ops.append(CIG.D)
            j -= 1
        else:
            ops.append(CIG.I)
            i -= 1
        s = prev
    ops.reverse()
    cigar: list[tuple[int, int]] = []
    for op in ops:
        if cigar and cigar[-1][0] == op:
            cigar[-1] = (op, cigar[-1][1] + 1)
        else:
            cigar.append((op, 1))
    return score, cigar
