"""Maximum-expected-accuracy (AMAP) decode over banded pair-HMM posteriors.

Replaces the redecoding step of ``cactus_realign --gapGamma --matchGamma``
(reference /root/reference/nanopore/analyses/utils.py:587,
mappers/abstractMapper.py:25): given posterior match / gap probabilities
from the forward-backward kernel, find the monotone alignment maximising

    sum_{aligned pairs} (gamma_match(i,j) - matchGamma)
  + gapGamma * sum_{gaps} gamma_gap(i,j)

over the same guide band.  The DP runs as an anti-diagonal ``lax.scan`` on
device emitting packed direction codes; the traceback is a linear host
walk over the direction band.

Deterministic tie-break: diagonal (match) > delete (ref gap) > insert
(read gap) — documented replacement for the reference's unstated C-side
tie-breaking (SURVEY.md "hard parts").
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from nanopore_tpu.io.sam import CIG
from nanopore_tpu.ops.pairhmm import _shift_sel

NEG = -1e30
DIR_DIAG, DIR_DEL, DIR_INS, DIR_NONE = 0, 1, 2, 3


def _mea_scan_single(
    gamma_match, gamma_del, gamma_ins, offsets, m, n, gap_gamma, match_gamma, W
):
    K = offsets.shape[0] - 1

    v0 = jnp.full((W,), NEG, jnp.float32).at[0].set(0.0)

    def step(carry, xs):
        prev, prevprev = carry
        k, o_k, o_km1, o_km2, g_m, g_d, g_i = xs
        d1 = o_k - o_km1
        d2 = o_k - o_km2 - 1

        diag = _shift_sel(prevprev, d2, -1, 1, NEG) + g_m - match_gamma
        left = _shift_sel(prev, d1 - 1, -1, 0, NEG) + gap_gamma * g_d
        up = _shift_sel(prev, d1, 0, 1, NEG) + gap_gamma * g_i

        stacked = jnp.stack([diag, left, up])  # order = tie-break priority
        best = jnp.max(stacked, axis=0)
        choice = jnp.argmax(stacked, axis=0).astype(jnp.int8)

        b = lax.broadcasted_iota(jnp.int32, (W,), 0)
        j = o_k + b
        i = k - j
        valid = (j >= 0) & (j <= n) & (i >= 0) & (i <= m)
        new = jnp.where(valid, best, NEG)
        choice = jnp.where(valid & (best > NEG / 2), choice, DIR_NONE).astype(
            jnp.int8
        )
        return (new, prev), choice

    ks = jnp.arange(1, K + 1)
    o_k = offsets[1:]
    o_km1 = offsets[:-1]
    o_km2 = jnp.concatenate([jnp.zeros((1,), jnp.int32), offsets[:-2]])
    xs = (ks, o_k, o_km1, o_km2, gamma_match[1:], gamma_del[1:], gamma_ins[1:])
    (final_v, _), dirs = lax.scan(
        step, (v0, jnp.full((W,), NEG)), xs, unroll=8
    )
    # final alignment score sits at band index 0 of diagonal k_end = m + n;
    # for batch-padded reads (K > m+n) the caller ignores it.
    score = final_v[0]
    dirs_full = jnp.concatenate(
        [jnp.full((1, W), DIR_NONE, jnp.int8), dirs], axis=0
    )
    return dirs_full, score


@functools.partial(jax.jit, static_argnames=("band_width",))
def _mea_jit(gamma_match, gamma_del, gamma_ins, offsets, m, n,
             gap_gamma, match_gamma, band_width):
    fn = lambda gm, gd, gi, o, me, ne: _mea_scan_single(
        gm, gd, gi, o, me, ne, gap_gamma, match_gamma, band_width
    )
    return jax.vmap(fn)(gamma_match, gamma_del, gamma_ins, offsets, m, n)


def mea_decode_batch(
    fb_out: dict,
    offsets: jax.Array,
    m: jax.Array,
    n: jax.Array,
    band_width: int,
    gap_gamma: float = 0.5,
    match_gamma: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Run the banded MEA DP for a batch.  Returns (dirs (B,K+1,W), score)."""
    return _mea_jit(
        fb_out["gamma_match"],
        fb_out["gamma_del"],
        fb_out["gamma_ins"],
        offsets,
        m,
        n,
        float(gap_gamma),
        float(match_gamma),
        band_width,
    )


def mea_traceback(
    dirs: np.ndarray, offsets: np.ndarray, m: int, n: int
) -> list[tuple[int, int]]:
    """Host traceback of the direction band into a SAM cigar (M/I/D runs).

    The returned cigar is a GLOBAL alignment: it consumes exactly m read
    bases and n ref bases (the invariant the reference maintains for
    chained records, utils.py:381-382).
    """
    dirs = np.asarray(dirs)
    offsets = np.asarray(offsets)
    i, j = m, n
    ops_rev: list[int] = []
    while i > 0 or j > 0:
        k = i + j
        b = j - offsets[k]
        d = dirs[k, b] if 0 <= b < dirs.shape[1] else DIR_NONE
        if d == DIR_DIAG and i > 0 and j > 0:
            ops_rev.append(CIG.M)
            i -= 1
            j -= 1
        elif d == DIR_DEL and j > 0:
            ops_rev.append(CIG.D)
            j -= 1
        elif d == DIR_INS and i > 0:
            ops_rev.append(CIG.I)
            i -= 1
        elif d == DIR_NONE:
            # off-band fallback (shouldn't happen: band contains the guide
            # path and the DP only reaches band cells) — consume greedily.
            if j > 0:
                ops_rev.append(CIG.D)
                j -= 1
            else:
                ops_rev.append(CIG.I)
                i -= 1
        else:  # direction points outside the lattice; consume what's left
            if d == DIR_DEL or i == 0:
                ops_rev.append(CIG.D)
                j -= 1
            else:
                ops_rev.append(CIG.I)
                i -= 1
    # merge runs
    cigar: list[tuple[int, int]] = []
    for op in reversed(ops_rev):
        if cigar and cigar[-1][0] == op:
            cigar[-1] = (op, cigar[-1][1] + 1)
        else:
            cigar.append((op, 1))
    return cigar


def rescore_by_posterior(
    gamma_match: np.ndarray,
    offsets: np.ndarray,
    cigar: list[tuple[int, int]],
) -> float:
    """Average posterior match probability over a cigar's aligned pairs.

    Semantics of ``cactus_realign --rescoreByPosteriorProbIgnoringGaps``
    whose score the AlignmentUncertainty analysis consumes (reference
    analyses/alignmentUncertainty.py:41-48).
    """
    gamma_match = np.asarray(gamma_match)
    offsets = np.asarray(offsets)
    i = j = 0
    total, count = 0.0, 0
    W = gamma_match.shape[1]
    for op, length in cigar:
        if op in (CIG.M, CIG.EQ, CIG.X):
            for _ in range(length):
                i += 1
                j += 1
                k = i + j
                b = j - offsets[k]
                if 0 <= b < W:
                    total += float(gamma_match[k, b])
                count += 1
        elif op == CIG.I:
            i += length
        elif op in (CIG.D, CIG.N):
            j += length
    return total / count if count else float("nan")
