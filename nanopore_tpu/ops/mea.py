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


# --------------------------------------------------------------------- #
# Fused rematerialised realign: forward + backward + reverse-MEA in one
# pass with O(K/C + C) memory (no stored lattice, no gamma bands)
# --------------------------------------------------------------------- #
def _realign_fused_single(params, batch_elem, gap_gamma, match_gamma,
                          segment_size: int):
    """One read: remat fwd/bwd with the MEA DP fused into the backward.

    The MEA DP normally consumes the (K+1, W) posterior bands AFTER the
    backward pass (mea_decode_batch) — storing 3 f32 bands plus the
    (K+1, 5, W) forward lattice, ~20 MB per 10 kb read.  Running MEA as a
    REVERSE DP (best score from each cell to (m, n)) inside the backward
    scan consumes each diagonal's posteriors the moment they exist, so
    the only O(K) array that survives is the (K+1, W) int8 direction
    band.  Memory per read drops ~25x, which is what lets realignment
    batches scale into the thousands (the scan is latency-bound, so
    throughput is ~linear in batch).

    Returns dict(loglik, trans, emis, score, dirs(K+1, W) int8) — dirs
    point FORWARD (traceback with mea_traceback_fwd from (0, 0)).
    """
    import jax
    from nanopore_tpu.ops.pairhmm import (
        NUM_STATES,
        SCAN_UNROLL,
        _PAD_SENTINEL,
        _bwd_init,
        _bwd_xs_arrays,
        _emis_from_parts,
        _fwd_carry_init,
        _fwd_start,
        _make_bwd_step,
        _make_fwd_step,
        _valid_mask,
    )

    xc, yc, xn, yn, offsets, m, n, k_end, W = batch_elem
    K = offsets.shape[0] - 1
    C = int(segment_size)
    S = -(-K // C)
    K_pad = S * C
    pad = K_pad - K
    if pad:
        offsets = jnp.concatenate(
            [offsets, jnp.broadcast_to(offsets[-1], (pad,))]
        )
        pad_codes = jnp.full((pad, W), _PAD_SENTINEL, xc.dtype)
        xc = jnp.concatenate([xc, pad_codes])
        yc = jnp.concatenate([yc, pad_codes])
        xn = jnp.concatenate([xn, pad_codes])
        yn = jnp.concatenate([yn, pad_codes])

    ks = jnp.arange(1, K_pad + 1)
    o_k = offsets[1:]
    d1 = offsets[1:] - offsets[:-1]
    o_km2 = jnp.concatenate([jnp.zeros((1,), jnp.int32), offsets[:-2]])
    d2 = o_k - o_km2 - 1
    fxs = (ks, o_k, d1, d2, xc[1:], yc[1:])
    seg = lambda a: a.reshape((S, C) + a.shape[1:])
    fxs_seg = jax.tree_util.tree_map(seg, fxs)

    fwd_nostore = _make_fwd_step(params, m, n, k_end, W, store_lattice=False)
    fwd_store = _make_fwd_step(params, m, n, k_end, W, store_lattice=True)

    def seg_fwd(carry, seg_xs):
        out_carry, _ = lax.scan(fwd_nostore, carry, seg_xs,
                                unroll=SCAN_UNROLL)
        return out_carry, carry

    init = _fwd_carry_init(W)
    fin_carry, boundaries = lax.scan(seg_fwd, init, fxs_seg)
    loglik = fin_carry[-1]
    fin_end = fin_carry[-2]

    bwd_step = _make_bwd_step(params, fin_end, m, n, k_end, W,
                              emit_gammas=True)
    gg = jnp.float32(gap_gamma)
    mg = jnp.float32(match_gamma)
    end_u = jnp.full((W,), NEG, jnp.float32).at[0].set(0.0)

    def fused_step(carry, xs):
        bcarry, u1, u2, gm1, gm2, gd1, gi1 = carry
        k, o_kk, d1n, d2n2 = xs[0], xs[1], xs[2], xs[3]
        bcarry, (g_m, g_d, g_i) = bwd_step(bcarry, xs)

        # reverse MEA: moves out of diagonal k into k+1 / k+2, gains at
        # the DESTINATION cell; shift geometry identical to the backward
        # kernel's destination alignment
        diag_t = _shift_sel(u2 + gm2 - mg, -d2n2, -1, 1, NEG)
        left_t = _shift_sel(u1 + gg * gd1, 1 - d1n, 0, 1, NEG)
        up_t = _shift_sel(u1 + gg * gi1, -d1n, -1, 0, NEG)
        stacked = jnp.stack([diag_t, left_t, up_t])  # tie-break priority
        best = jnp.max(stacked, axis=0)
        choice = jnp.argmax(stacked, axis=0).astype(jnp.int8)

        valid = _valid_mask(k, o_kk, m, n, W) > 0
        best = jnp.where(valid, best, NEG)
        is_end = k == k_end
        new_u = jnp.where(is_end, end_u, best)
        choice = jnp.where(
            valid & (new_u > NEG / 2) & jnp.logical_not(is_end),
            choice, jnp.int8(DIR_NONE),
        )
        new_carry = (bcarry, new_u, u1, g_m, gm1, g_d, g_i)
        return new_carry, choice

    d1n, d2n2 = _bwd_xs_arrays(offsets)
    bxs = (ks, o_k, d1n[1:], d2n2[1:], xn[1:], yn[1:], xc[1:], yc[1:])
    bxs_seg = jax.tree_util.tree_map(seg, bxs)

    rev = lambda a: a[::-1]
    fxs_rev = jax.tree_util.tree_map(rev, fxs_seg)
    bxs_rev = jax.tree_util.tree_map(rev, bxs_seg)
    bnd_rev = jax.tree_util.tree_map(rev, boundaries)

    def seg_bwd(carry, seg_in):
        fwd_carry_in, seg_bxs, seg_fxs = seg_in
        _, (f_seg, sfinv_seg) = lax.scan(fwd_store, fwd_carry_in,
                                         seg_fxs, unroll=SCAN_UNROLL)
        k_, o_, d1_, d2_, xn_, yn_, xc_, yc_ = seg_bxs
        xs = (
            k_[::-1], o_[::-1], d1_[::-1], d2_[::-1],
            f_seg[::-1], sfinv_seg[::-1],
            xn_[::-1], yn_[::-1], xc_[::-1], yc_[::-1],
        )
        new_carry, dirs_seg = lax.scan(fused_step, carry, xs,
                                       unroll=SCAN_UNROLL)
        return new_carry, dirs_seg

    zw = jnp.zeros((W,), jnp.float32)
    mea_init = (jnp.full((W,), NEG, jnp.float32),
                jnp.full((W,), NEG, jnp.float32), zw, zw, zw, zw)
    carry, dirs_rev = lax.scan(
        seg_bwd, (_bwd_init(W),) + mea_init, (bnd_rev, bxs_rev, fxs_rev)
    )
    # final step: diagonal 0 (f = start tile at zero log-scale)
    xs0 = (jnp.int32(0), offsets[0], d1n[0], d2n2[0],
           _fwd_start(W), jnp.float32(1.0), xn[0], yn[0], xc[0], yc[0])
    carry, choice0 = fused_step(carry, xs0)
    bcarry, u0 = carry[0], carry[1]
    trans, e16, edel, eins = bcarry[-4:]

    # dirs_rev: (S, C, W), segment-major with diagonals descending
    dirs_desc = dirs_rev.reshape(S * C, W)  # diagonals K_pad .. 1
    dirs_full = jnp.concatenate(
        [choice0[None], dirs_desc[::-1]], axis=0
    )  # index = diagonal
    return {
        "loglik": loglik,
        "trans": trans,
        "emis": _emis_from_parts(e16, edel, eins),
        "score": u0[0],
        "dirs": dirs_full[: K + 1],
    }


@functools.partial(
    jax.jit, static_argnames=("band_width", "segment_size")
)
def _realign_fused_jit(params, xc, yc, xn, yn, offsets, m, n, k_end,
                       gap_gamma, match_gamma, band_width, segment_size):
    fn = lambda *elem: _realign_fused_single(
        params, (*elem, band_width), gap_gamma, match_gamma, segment_size
    )
    return jax.vmap(fn)(xc, yc, xn, yn, offsets, m, n, k_end)


def realign_fused(batch, params, gap_gamma: float = 0.5,
                  match_gamma: float = 0.0,
                  segment_size: int = 512) -> dict:
    """Batched fused realign: loglik/trans/emis/score/dirs per read.

    Same decode objective as forward_backward + mea_decode_batch but
    without the O(K) stored lattice or posterior bands; dirs point
    forward (use mea_traceback_fwd).
    """
    return _realign_fused_jit(
        params, batch.xc, batch.yc, batch.xn, batch.yn, batch.offsets,
        batch.m, batch.n, batch.k_end,
        jnp.float32(gap_gamma), jnp.float32(match_gamma),
        batch.band_width, int(segment_size),
    )


# --------------------------------------------------------------------- #
# On-device batched traceback
# --------------------------------------------------------------------- #
# The per-cell Python walk (mea_traceback_fwd) forces the ENTIRE
# direction band to the host — (B, K+1, W) int8 is ~655 MB at bench
# shapes, against a remote device — and then burns ~m+n Python-loop
# iterations per read.  The walk is sequential per read but each
# diagonal holds at most ONE visited cell, so it vectorises over the
# batch as a lax.scan over diagonals: carry = (i, j, next-diagonal) per
# read, each step selects the current cell's direction with a one-hot
# band contraction (never a gather — CLAUDE.md perf rule 2) and emits
# one op code per read.  Device->host traffic drops to the (B, K+1)
# int8 op matrix (~10 MB) and the host does a vectorised run-length
# encode.  Semantics are pinned to mea_traceback_fwd
# (tests/test_mea.py::test_device_traceback_matches_host).

OP_M, OP_D, OP_I, OP_NONE = 0, 1, 2, 3
_OP_TO_CIG = {OP_M: CIG.M, OP_D: CIG.D, OP_I: CIG.I}


@jax.jit
def _traceback_ops_jit(dirs, offsets, m, n):
    """dirs (B, K1, W) int8 forward dir codes -> per-diagonal op codes.

    Returns (B, K1) int8 in {OP_M, OP_D, OP_I, OP_NONE}; the op at
    column k is the move taken OUT of the path cell on diagonal k
    (OP_NONE where the path skipped diagonal k or already ended).
    """
    from nanopore_tpu.ops.pairhmm import SCAN_UNROLL

    B, K1, W = dirs.shape
    dirs_t = jnp.swapaxes(dirs, 0, 1)  # (K1, B, W)
    offs_t = jnp.swapaxes(offsets, 0, 1).astype(jnp.int32)  # (K1, B)
    lanes = jnp.arange(W, dtype=jnp.int32)
    m = m.astype(jnp.int32)
    n = n.astype(jnp.int32)
    zero = jnp.zeros((B,), jnp.int32)

    def step(carry, xs):
        i, j, nk = carry
        dirs_k, off_k, k = xs
        active = (nk == k) & ((i < m) | (j < n))
        b = j - off_k
        in_band = (b >= 0) & (b < W)
        oh = lanes[None, :] == b[:, None]
        d = jnp.sum(jnp.where(oh, dirs_k.astype(jnp.int32), 0), axis=1)
        d = jnp.where(in_band, d, DIR_NONE)
        can_diag = (d == DIR_DIAG) & (i < m) & (j < n)
        can_del = (d == DIR_DEL) & (j < n)
        can_ins = (d == DIR_INS) & (i < m)
        # fallback order pinned to mea_traceback_fwd: D while ref
        # remains, else I
        fb_del = ~(can_diag | can_del | can_ins) & (j < n)
        op = jnp.where(
            can_diag, OP_M, jnp.where(can_del | fb_del, OP_D, OP_I)
        )
        op = jnp.where(active, op, OP_NONE).astype(jnp.int8)
        di = (active & ((op == OP_M) | (op == OP_I))).astype(jnp.int32)
        dj = (active & ((op == OP_M) | (op == OP_D))).astype(jnp.int32)
        i = i + di
        j = j + dj
        nk = jnp.where(active, i + j, nk)
        return (i, j, nk), op

    xs = (dirs_t, offs_t, jnp.arange(K1, dtype=jnp.int32))
    _, ops = lax.scan(step, (zero, zero, zero), xs, unroll=SCAN_UNROLL)
    return jnp.swapaxes(ops, 0, 1)  # (B, K1)


def _rle_ops_row(row: np.ndarray) -> list[tuple[int, int]]:
    """Run-length encode one read's op-code row into a cigar."""
    sel = row[row != OP_NONE]
    if sel.size == 0:
        return []
    change = np.nonzero(np.diff(sel))[0]
    starts = np.concatenate([[0], change + 1])
    ends = np.concatenate([change + 1, [sel.size]])
    return [
        (_OP_TO_CIG[int(sel[s])], int(e - s))
        for s, e in zip(starts, ends)
    ]


def rle_ops_batch(ops_b: np.ndarray) -> list[list[tuple[int, int]]]:
    """Vectorised batch run-length encode: (B, K1) op codes -> cigars.

    One set of full-matrix numpy passes instead of B per-row passes —
    at B=1024 x K=10^4 the per-row loop costs ~1 s/batch, several
    times the on-chip walk it postprocesses.  Row boundaries break
    runs via the row-id stream; per-read work is O(#runs) only.
    """
    ops_b = np.ascontiguousarray(ops_b)
    B = ops_b.shape[0]
    mask = ops_b != OP_NONE
    counts = mask.sum(axis=1)
    flat = ops_b[mask]
    if flat.size == 0:
        return [[] for _ in range(B)]
    row_id = np.repeat(np.arange(B, dtype=np.int64), counts)
    brk = np.nonzero(
        (flat[1:] != flat[:-1]) | (row_id[1:] != row_id[:-1])
    )[0]
    starts = np.concatenate([[0], brk + 1])
    lens = np.diff(np.concatenate([starts, [flat.size]]))
    run_ops = flat[starts]
    run_rows = row_id[starts]
    # runs are row-major: slice each read's run range.  The tuple
    # build dominates this function (~6x the numpy passes at 300k
    # runs): map op codes with one vectorised LUT, convert BOTH run
    # arrays to Python lists in one C pass each, and zip list slices —
    # never call int() per element
    lut = np.zeros(max(_OP_TO_CIG) + 1, np.int64)
    for k, v in _OP_TO_CIG.items():
        lut[k] = v
    cig_ops = lut[run_ops].tolist()
    lens_l = lens.tolist()
    bounds = np.searchsorted(run_rows, np.arange(B + 1)).tolist()
    out: list[list[tuple[int, int]]] = []
    for b in range(B):
        lo, hi = bounds[b], bounds[b + 1]
        out.append(list(zip(cig_ops[lo:hi], lens_l[lo:hi])))
    return out


def traceback_cigars_batch(
    dirs, offsets, m, n
) -> list[list[tuple[int, int]]]:
    """Batched traceback of FORWARD direction bands into global cigars.

    Drop-in batched replacement for per-record ``mea_traceback_fwd``
    calls: ``dirs`` may live on device (it is consumed there); only the
    tiny op matrix crosses to the host.  Each returned cigar consumes
    exactly m[b] read / n[b] ref bases.
    """
    ops = np.asarray(
        _traceback_ops_jit(
            jnp.asarray(dirs),
            jnp.asarray(offsets),
            jnp.asarray(m),
            jnp.asarray(n),
        )
    )
    return rle_ops_batch(ops)


@jax.jit
def _traceback_ops_raw_jit(dirs_raw, offs_t, m, n):
    """Raw-layout traceback: dirs in the Pallas kernel's native
    k-major layout (NB, K1, W, BT) — no (B, K1, W) band transpose
    (a ~0.7 GB byte-shuffle per batch at production shapes).

    offs_t (K1, NB, BT) int32, m/n (NB, BT).  Returns (K1, NB, BT)
    int8 op codes (same semantics as _traceback_ops_jit).
    """
    from nanopore_tpu.ops.pairhmm import SCAN_UNROLL

    NB, K1, W, BT = dirs_raw.shape
    # MATERIALISE the k-major view before the scan: without the
    # barrier XLA fuses the transpose into the loop as a per-step
    # strided gather, turning a ~0.2 s walk into seconds
    dirs_t = lax.optimization_barrier(
        jnp.transpose(dirs_raw, (1, 0, 2, 3))
    )  # (K1, NB, W, BT)
    lanes = jnp.arange(W, dtype=jnp.int32)[None, :, None]
    m = m.astype(jnp.int32)
    n = n.astype(jnp.int32)
    zero = jnp.zeros((NB, BT), jnp.int32)

    def step(carry, xs):
        i, j, nk = carry
        dirs_k, off_k, k = xs
        active = (nk == k) & ((i < m) | (j < n))
        b = j - off_k
        in_band = (b >= 0) & (b < W)
        oh = lanes == b[:, None, :]
        d = jnp.sum(jnp.where(oh, dirs_k.astype(jnp.int32), 0), axis=1)
        d = jnp.where(in_band, d, DIR_NONE)
        can_diag = (d == DIR_DIAG) & (i < m) & (j < n)
        can_del = (d == DIR_DEL) & (j < n)
        can_ins = (d == DIR_INS) & (i < m)
        fb_del = ~(can_diag | can_del | can_ins) & (j < n)
        op = jnp.where(
            can_diag, OP_M, jnp.where(can_del | fb_del, OP_D, OP_I)
        )
        op = jnp.where(active, op, OP_NONE).astype(jnp.int8)
        di = (active & ((op == OP_M) | (op == OP_I))).astype(jnp.int32)
        dj = (active & ((op == OP_M) | (op == OP_D))).astype(jnp.int32)
        i = i + di
        j = j + dj
        nk = jnp.where(active, i + j, nk)
        return (i, j, nk), op

    xs = (dirs_t, offs_t, jnp.arange(K1, dtype=jnp.int32))
    _, ops = lax.scan(step, (zero, zero, zero), xs, unroll=SCAN_UNROLL)
    return ops  # (K1, NB, BT)


def traceback_cigars_raw(
    dirs_raw, offsets, m, n
) -> list[list[tuple[int, int]]]:
    """Batched traceback straight off the kernel's k-major direction
    layout (PallasRealignPlan run()["dirs_raw"]).  Only the per-diagonal
    op matrix crosses to the host; pinned to traceback_cigars_batch /
    mea_traceback_fwd semantics by tests."""
    import jax.numpy as jnp

    NB, K1, W, BT = dirs_raw.shape
    offsets = np.asarray(offsets)
    m = np.asarray(m)
    n = np.asarray(n)
    B = m.shape[0]
    offs = np.zeros((NB * BT, K1), np.int32)
    ko = min(offsets.shape[1], K1)
    offs[:B, :ko] = offsets[:, :ko]
    if ko < K1:  # raw tensor spans k_pad; offsets are constant past K
        offs[:B, ko:] = offsets[:, -1:]
    offs_t = np.ascontiguousarray(
        offs.reshape(NB, BT, K1).transpose(2, 0, 1)
    )
    mm = np.zeros(NB * BT, np.int32)
    mm[:B] = m
    nn = np.zeros(NB * BT, np.int32)
    nn[:B] = n
    ops = np.asarray(
        _traceback_ops_raw_jit(
            jnp.asarray(dirs_raw),
            jnp.asarray(offs_t),
            jnp.asarray(mm.reshape(NB, BT)),
            jnp.asarray(nn.reshape(NB, BT)),
        )
    )  # (K1, NB, BT)
    ops_b = ops.transpose(1, 2, 0).reshape(NB * BT, K1)
    return [_rle_ops_row(ops_b[b]) for b in range(B)]


def mea_traceback_fwd(
    dirs: np.ndarray, offsets: np.ndarray, m: int, n: int
) -> list[tuple[int, int]]:
    """Host traceback of FORWARD direction codes (realign_fused) into a
    global SAM cigar consuming exactly m read / n ref bases."""
    dirs = np.asarray(dirs)
    offsets = np.asarray(offsets)
    i = j = 0
    ops: list[int] = []
    W = dirs.shape[1]
    while i < m or j < n:
        k = i + j
        b = j - offsets[k]
        d = dirs[k, b] if 0 <= b < W else DIR_NONE
        if d == DIR_DIAG and i < m and j < n:
            ops.append(CIG.M)
            i += 1
            j += 1
        elif d == DIR_DEL and j < n:
            ops.append(CIG.D)
            j += 1
        elif d == DIR_INS and i < m:
            ops.append(CIG.I)
            i += 1
        else:
            # off-band / degenerate fallback: consume what's left
            if j < n:
                ops.append(CIG.D)
                j += 1
            else:
                ops.append(CIG.I)
                i += 1
    cigar: list[tuple[int, int]] = []
    for op in ops:
        if cigar and cigar[-1][0] == op:
            cigar[-1] = (op, cigar[-1][1] + 1)
        else:
            cigar.append((op, 1))
    return cigar
