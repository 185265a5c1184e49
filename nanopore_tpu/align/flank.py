"""Analytic flank contributions for EM on windowed global alignments.

The reference trains its HMM on CHAINED GLOBAL alignments — every read's
cigar spans the whole reference (utils.py:491-501) — and bounds the DP
cost with ``--splitMatrixBiggerThanThis=300`` matrix splitting
(/root/reference/nanopore/analyses/utils.py:509-523).  Realign and the
SNP caller here window each global record to its aligned ref span
(align.realign.window_global_pair), but EM could not: the flanking
pure-deletion runs carry real Baum-Welch mass (one D transition + one
delete-state emission per flanked ref base) that the M-step must see, or
the trained model's delete dwell probabilities collapse.

This module computes that flank mass in closed form so EM can train on
windowed lattices in bounded memory.  In the full banded lattice a flank
is a pure-deletion CORRIDOR: at read offset 0 (left flank) or m (right
flank) only the two delete states can advance, so the flank reduces to
an exact 2-state inhomogeneous HMM over the flank bases — O(flank) time
with a 5-word state, instead of O(flank * W * 5) lattice work and HBM
diagonals on device.

Boundary conditions use an overlap-subtraction ("Ext − Stub") scheme:

  correction_left  = C(x[0:a0],  entry=start) − C(x[g0:a0], entry=start)
  correction_right = C(x[a1:n],  entry=ones)  − C(x[a1:g1], entry=ones)

where [a0, a1) is the aligned ref span, [g0, g1) the window kept for the
device lattice (a0 − g0 = right-sized stub = ``pad``), C(·) the corridor
forward/backward expected counts.  The window lattice itself computes
stub counts with a fresh start distribution at g0; the Stub term
subtracts exactly that and the Ext term replaces it with the true
corridor from position 0.  Unknown junction profiles (the backward
messages at a0, the forward profile at a1) appear IDENTICALLY in both
terms of each difference and cancel up to O(rho^pad), rho the corridor
mixing rate — so the scheme converges exponentially in ``pad`` to the
full-lattice expectations (validated window==full at ~1e-4 in
tests/test_realign_em.py).

What is knowingly neglected: paths that consume READ bases deep in the
flank (the band admits ~W/2 of them).  Their transition structure is
equivalent to in-window consumption and their posterior mass beyond the
pad is tiny; the window==full test bounds the residual.
"""

from __future__ import annotations

import numpy as np

from nanopore_tpu.align.model import (
    DELETE_STATES,
    NUM_STATES,
    PairHmmModel,
)

_D = np.array(DELETE_STATES, np.int64)  # (2,): short delete, long delete


def flank_lengths(cigar) -> tuple[int, int]:
    """(lead, tail) pure-deletion run lengths of a global guide cigar."""
    from nanopore_tpu.io.sam import CIG as _C

    lead = 0
    i = 0
    while i < len(cigar) and cigar[i][0] in (_C.D, _C.N):
        lead += cigar[i][1]
        i += 1
    if i == len(cigar):  # degenerate: all-deletion guide
        return lead, 0
    tail = 0
    j = len(cigar)
    while j > i and cigar[j - 1][0] in (_C.D, _C.N):
        tail += cigar[j - 1][1]
        j -= 1
    return lead, tail


def corridor_tables(model: PairHmmModel) -> tuple[np.ndarray, np.ndarray]:
    """(T (5,5), eg (5,5)) linear-space tables for the corridor.

    ``eg[state, base]`` are the per-state single-base gap emissions with
    the N column marginalised uniformly — exactly the oracle's
    convention (ops.pairhmm_ref.PairHmmParams.from_model)."""
    t = np.asarray(model.transitions, np.float64)
    gap = np.asarray(model.gap_emissions(), np.float64)  # (5, 4)
    eg = np.zeros((NUM_STATES, 5))
    eg[:, :4] = gap
    eg[:, 4] = gap.mean(axis=1)
    return t, eg


def corridor_expectations(
    x: np.ndarray,
    t: np.ndarray,
    eg: np.ndarray,
    entry: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Exact expected counts of the pure-deletion corridor over x.

    Forward/backward over the 2 delete states with per-step
    normalisation (all scale factors cancel in the count ratios).
    ``entry`` is the 5-state weight vector at the corridor's entry cell
    (the model start distribution at a true lattice origin; ones when
    the arrival profile is unknown — it cancels in Ext − Stub).  The
    exit is free (unit weight per delete state), matching both the
    lattice end (unit end weights, ops.pairhmm_ref) and the
    cancellation scheme.

    Returns (trans (5,5), emis (5,16), logz).  Prefers the native C++
    kernel (runtime.native_index.flank_corridor); this NumPy loop is
    the exact fallback / test oracle.
    """
    from nanopore_tpu.runtime.native_index import flank_corridor

    native = flank_corridor(x, t, eg, entry)
    if native is not None:
        return native
    return _corridor_expectations_np(x, t, eg, entry)


def _corridor_expectations_np(
    x: np.ndarray,
    t: np.ndarray,
    eg: np.ndarray,
    entry: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, float]:
    F = len(x)
    trans = np.zeros((NUM_STATES, NUM_STATES))
    emis = np.zeros((NUM_STATES, 16))
    entry = np.asarray(entry, np.float64)
    if F == 0:
        return trans, emis, float(np.log(max(entry[_D].sum(), 1e-300)))
    tD = t[:, _D]  # (5, 2) into delete states
    tDD = t[np.ix_(_D, _D)]  # (2, 2) within corridor
    egD = eg[_D]  # (2, 5)
    xs = np.asarray(x, np.int64)

    # forward, normalised per step; f[k] over the 2 delete states
    f = np.empty((F + 1, 2))
    s0 = entry.sum()
    logz = np.log(max(s0, 1e-300))
    e0 = entry / max(s0, 1e-300)
    raw = (e0 @ tD) * egD[:, xs[0]]
    for k in range(1, F + 1):
        if k > 1:
            raw = (f[k - 1] @ tDD) * egD[:, xs[k - 1]]
        sk = raw.sum()
        if sk <= 0.0:
            return trans, emis, float("-inf")
        f[k] = raw / sk
        logz += np.log(sk)
    logz += np.log(max(f[F].sum(), 1e-300))  # unit exit weights

    # backward with on-the-fly count accumulation
    b = np.ones(2)
    for k in range(F, 0, -1):
        xb = xs[k - 1]
        # occupancy of cell k (it consumed x[k-1])
        occ = f[k] * b
        zd = occ.sum()
        if zd > 0 and xb < 4:
            g = occ / zd / 4.0
            emis[_D, xb * 4 : xb * 4 + 4] += g[:, None]
        # transition into cell k
        me = tDD * (egD[:, xb] * b)[None, :] if k > 1 else None
        if k == 1:
            src = e0
            m5 = tD * (egD[:, xb] * b)[None, :]  # (5, 2)
            w = src[:, None] * m5
            den = w.sum()
            if den > 0:
                trans[:, _D] += w / den
            break
        src = f[k - 1]
        w = src[:, None] * me
        den = w.sum()
        if den > 0:
            trans[np.ix_(_D, _D)] += w / den
        # step backward
        braw = (tDD * (egD[:, xb])[None, :]) @ b
        sb = braw.sum()
        if sb <= 0.0:
            return trans, emis, float("-inf")
        b = braw / sb
    return trans, emis, float(logz)


_START = np.full(NUM_STATES, 1.0 / NUM_STATES)  # oracle start distribution
_ONES = np.ones(NUM_STATES)


def em_flank_correction(
    x: np.ndarray,
    cigar,
    pad: int,
    t: np.ndarray,
    eg: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Ext − Stub flank correction for one windowed global pair.

    ``x`` is the FULL reference codes, ``cigar`` the full global guide;
    ``pad`` must equal the window pad used to build the device lattice
    (align.realign.window_global_pair).  Returns (trans (5,5),
    emis (5,16), dloglik) to ADD to the windowed lattice's E-step
    output under the model whose corridor tables are (t, eg).
    """
    n = len(x)
    lead, tail = flank_lengths(cigar)
    a0, a1 = lead, n - tail
    g0, g1 = max(0, lead - pad), min(n, n - tail + pad)
    trans = np.zeros((NUM_STATES, NUM_STATES))
    emis = np.zeros((NUM_STATES, 16))
    dll = 0.0
    if g0 > 0:
        et, ee, ez = corridor_expectations(x[:a0], t, eg, _START)
        st, se, sz = corridor_expectations(x[g0:a0], t, eg, _START)
        trans += et - st
        emis += ee - se
        dll += ez - sz
    if g1 < n:
        et, ee, ez = corridor_expectations(x[a1:], t, eg, _ONES)
        st, se, sz = corridor_expectations(x[a1:g1], t, eg, _ONES)
        trans += et - st
        emis += ee - se
        dll += ez - sz
    return trans, emis, dll
