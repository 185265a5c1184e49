"""Banded five-state pair-HMM forward/backward as a JAX anti-diagonal scan.

This is the TPU-native replacement for the reference pipeline's
``cactus_realign`` banded forward/backward core (invoked per read at
/root/reference/nanopore/analyses/utils.py:587, with banding flags
``--diagonalExpansion`` / ``--splitMatrixBiggerThanThis``,
utils.py:511,587).  One batched kernel serves all four reference call
sites: realignment, alignment uncertainty, EM training and SNP posterior
expectation (SURVEY.md section 7).

Design
------
The DP lattice over cells (i, j) = (read consumed, ref consumed) is
restricted to a band of static width W around the guide alignment, and
swept along anti-diagonals k = i + j (wavefront order) so every diagonal
depends only on the previous two — no intra-step sequential dependency,
ideal for a ``lax.scan`` whose per-step state is a (5, W) tile on the VPU.

Band bookkeeping: ``offsets[k]`` = leftmost ref coordinate j of the band
on diagonal k.  Offsets are built on the host from the guide cigar,
clipped to the valid lattice region, nondecreasing with steps in {0, 1}
(Lipschitz-1), and always contain the guide path.  By construction the
first cell (0,0) and the last cell (m,n) sit at band index 0 of their
diagonals.

Numerics: scaled probability space (f32) with one running log-scale per
diagonal — the per-diagonal max is divided out and accumulated in log
space, mirroring the classic scaled Baum-Welch recursion, avoiding
per-cell log/exp transcendentals on the VPU.

Semantics are oracle-tested against nanopore_tpu.ops.pairhmm_ref.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from nanopore_tpu.align.model import PairHmmModel, NUM_STATES
from nanopore_tpu.io.sam import CIG

DEFAULT_BAND_WIDTH = 64
# Unrolling amortises the TPU while-loop per-step latency (~1.5-14us
# measured on v5e via the remote runtime) across several anti-diagonals.
# Compile time grows with the unroll factor (the remote-compiled fwd+bwd
# graph took >9min at unroll=8), so the default stays moderate.
import os as _os

SCAN_UNROLL = int(_os.environ.get("NANOPORE_TPU_SCAN_UNROLL", "4"))
_PAD_SENTINEL = 4  # N code for out-of-range sequence reads


class KernelParams(NamedTuple):
    """Dense f32 probability tables for the kernel.

    t:            (5, 5) transitions [from, to]
    e_match_flat: (25,) match emissions [xcode * 5 + ycode] incl. N
    e_gap_flat:   (25,) per-state single-base emissions [state * 5 + base]
    """

    t: jax.Array
    e_match_flat: jax.Array
    e_gap_flat: jax.Array


def kernel_tables(transitions: jax.Array, emissions: jax.Array) -> KernelParams:
    """KernelParams from raw (5,5)/(5,16) model arrays, traceable in jit.

    The jax twin of make_kernel_params, used inside the sharded EM train
    step where the model parameters are traced values.
    """
    match = emissions[0].reshape(4, 4)
    e_match = jnp.zeros((5, 5), jnp.float32)
    e_match = e_match.at[:4, :4].set(match)
    e_match = e_match.at[4, :4].set(match.mean(axis=0))
    e_match = e_match.at[:4, 4].set(match.mean(axis=1))
    e_match = e_match.at[4, 4].set(match.mean())
    per_state = emissions.reshape(5, 4, 4)
    is_delete = jnp.array([0, 1, 0, 1, 0], bool)  # states 1,3 consume ref
    gap = jnp.where(
        is_delete[:, None], per_state.sum(axis=2), per_state.sum(axis=1)
    )
    gap = gap.at[0].set(0.0)  # match row unused (parity with host tables)
    e_gap = jnp.zeros((5, 5), jnp.float32)
    e_gap = e_gap.at[:, :4].set(gap)
    e_gap = e_gap.at[:, 4].set(gap.mean(axis=1))
    return KernelParams(
        t=transitions.astype(jnp.float32),
        e_match_flat=e_match.reshape(-1),
        e_gap_flat=e_gap.reshape(-1),
    )


def make_kernel_params(model: PairHmmModel) -> KernelParams:
    match = model.match_emissions()
    e_match = np.zeros((5, 5), dtype=np.float32)
    e_match[:4, :4] = match
    e_match[4, :4] = match.mean(axis=0)
    e_match[:4, 4] = match.mean(axis=1)
    e_match[4, 4] = match.mean()
    gap = model.gap_emissions()
    e_gap = np.zeros((5, 5), dtype=np.float32)
    e_gap[:, :4] = gap
    e_gap[:, 4] = gap.mean(axis=1)
    return KernelParams(
        t=jnp.asarray(model.transitions, dtype=jnp.float32),
        e_match_flat=jnp.asarray(e_match.reshape(-1), dtype=jnp.float32),
        e_gap_flat=jnp.asarray(e_gap.reshape(-1), dtype=jnp.float32),
    )


# --------------------------------------------------------------------- #
# Host-side band construction
# --------------------------------------------------------------------- #
def band_offsets_from_cigar(
    cigar: list[tuple[int, int]], m: int, n: int, band_width: int,
    k_max: int | None = None,
) -> np.ndarray:
    """Band offsets o[k] for k in [0, k_max] from a guide alignment.

    ``cigar`` is a SAM-op cigar describing a global alignment of the read
    (length m, consumed by M/I) against the ref window (length n, consumed
    by M/D), soft/hard clips ignored.  The band on diagonal k covers ref
    coordinates [o[k], o[k] + W).  This realises the reference's
    ``--diagonalExpansion`` banding generalised to follow the guide path
    exactly (utils.py:587) rather than a single straight diagonal.
    """
    if k_max is None:
        k_max = m + n
    # unit steps of the guide path
    di, dj = [], []
    for op, length in cigar:
        if op in (CIG.M, CIG.EQ, CIG.X):
            di.append(np.ones(length, np.int64)); dj.append(np.ones(length, np.int64))
        elif op == CIG.I:
            di.append(np.ones(length, np.int64)); dj.append(np.zeros(length, np.int64))
        elif op in (CIG.D, CIG.N):
            di.append(np.zeros(length, np.int64)); dj.append(np.ones(length, np.int64))
    if di:
        i_path = np.concatenate([[0], np.cumsum(np.concatenate(di))])
        j_path = np.concatenate([[0], np.cumsum(np.concatenate(dj))])
    else:
        i_path = np.array([0]); j_path = np.array([0])
    assert i_path[-1] <= m and j_path[-1] <= n, "guide cigar overruns sequences"
    k_path = i_path + j_path
    ks = np.arange(k_max + 1)
    # center c(k): guide path j at the first vertex with k_path >= k
    idx = np.searchsorted(k_path, np.minimum(ks, k_path[-1]))
    center = j_path[idx]
    lo = np.maximum(0, ks - m)
    hi = np.maximum(lo, np.minimum(ks, n) - band_width + 1)
    o = np.clip(center - band_width // 2, lo, hi)
    # ensure Lipschitz-1 nondecreasing past the end of the real lattice
    o[ks > m + n] = o[m + n] if m + n <= k_max else o[-1]
    d = np.diff(o)
    assert ((d >= 0) & (d <= 1)).all(), "band offsets not Lipschitz-1"
    return o.astype(np.int32)


class BandedBatch(NamedTuple):
    """Per-diagonal band arrays for a batch of guide-banded alignments.

    Sequence codes are PREGATHERED into band layout on the host so the
    device scan consumes them as plain xs slices: vmapped per-read
    dynamic slices lower to batched gathers on TPU and cost ~13x the
    whole step's compute (measured 47us vs 3.6us per step).

    xc: (B, K+1, W) int8 ref codes x[j-1] at band cell (k, b)
    yc: (B, K+1, W) int8 read codes y[i-1]
    xn: (B, K+1, W) int8 ref codes x[j] (backward-pass destinations)
    yn: (B, K+1, W) int8 read codes y[i]
    offsets: (B, K+1) int32 band offsets per diagonal
    m / n / k_end: (B,) int32 read / ref lengths and m + n
    band_width: static python int
    """

    xc: jax.Array
    yc: jax.Array
    xn: jax.Array
    yn: jax.Array
    offsets: jax.Array
    m: jax.Array
    n: jax.Array
    k_end: jax.Array
    band_width: int

    @property
    def k_max(self) -> int:
        return self.offsets.shape[1] - 1


def prepare_banded_batch(
    pairs: list[tuple[np.ndarray, np.ndarray, list[tuple[int, int]]]],
    band_width: int = DEFAULT_BAND_WIDTH,
    k_max: int | None = None,
    n_pad_to: int | None = None,
    m_pad_to: int | None = None,
    device: bool = True,
) -> BandedBatch:
    """Pack (ref_codes, read_codes, guide_cigar) tuples into a BandedBatch.

    ``k_max`` lets callers bucket the diagonal count (e.g. to powers of
    two) so jit caches stay small; ``n_pad_to``/``m_pad_to`` are accepted
    for API stability but only influence the default k_max.

    ``device=False`` keeps the arrays host-resident (numpy) — pass it
    when the batch feeds the Pallas repack (ops.dispatch picks it), so
    the band tensors are not uploaded only to be pulled back for
    packing; the XLA scan paths want the default upload-once arrays.
    """
    W = band_width
    ms = np.array([len(y) for _, y, _ in pairs], np.int32)
    ns = np.array([len(x) for x, _, _ in pairs], np.int32)
    if k_max is None and (n_pad_to or m_pad_to):
        k_max = int(n_pad_to or ns.max()) + int(m_pad_to or ms.max())
    K = int(k_max if k_max is not None else (ms + ns).max())
    B = len(pairs)
    xc = np.full((B, K + 1, W), _PAD_SENTINEL, np.int8)
    yc = np.full((B, K + 1, W), _PAD_SENTINEL, np.int8)
    xn = np.full((B, K + 1, W), _PAD_SENTINEL, np.int8)
    yn = np.full((B, K + 1, W), _PAD_SENTINEL, np.int8)
    offsets = np.zeros((B, K + 1), np.int32)
    b_idx = np.arange(W)[None, :]
    k_idx = np.arange(K + 1)[:, None]
    for b, (x, y, cig) in enumerate(pairs):
        o = band_offsets_from_cigar(cig, len(y), len(x), W, K)
        offsets[b] = o
        j = o[:, None] + b_idx  # (K+1, W) ref coordinate of band cells
        i = k_idx - j

        def gather(seq, pos):
            out = np.asarray(seq)[np.clip(pos, 0, len(seq) - 1)]
            return np.where((pos >= 0) & (pos < len(seq)), out, _PAD_SENTINEL)

        xc[b] = gather(x, j - 1)
        yc[b] = gather(y, i - 1)
        xn[b] = gather(x, j)
        yn[b] = gather(y, i)
    put = jnp.asarray if device else (lambda a: a)
    return BandedBatch(
        xc=put(xc),
        yc=put(yc),
        xn=put(xn),
        yn=put(yn),
        offsets=put(offsets),
        m=put(ms),
        n=put(ns),
        k_end=put(ms + ns),
        band_width=W,
    )


# --------------------------------------------------------------------- #
# Kernel helpers
# --------------------------------------------------------------------- #
def _static_shift(arr: jax.Array, s: int, fill: float = 0.0) -> jax.Array:
    """result[..., b] = arr[..., b + s] with constant fill; s static."""
    if s == 0:
        return arr
    pad = [(0, 0)] * (arr.ndim - 1)
    if s > 0:
        return jnp.pad(
            arr[..., s:], pad + [(0, s)], constant_values=fill
        )
    return jnp.pad(arr[..., :s], pad + [(-s, 0)], constant_values=fill)


def _shift_sel(
    arr: jax.Array, s: jax.Array, lo: int, hi: int, fill: float = 0.0
) -> jax.Array:
    """Band shift by a traced s in [lo, hi]: select among static shifts.

    A dynamic_slice here would become a batched gather under vmap (the
    per-read shift differs); selecting between the 2-3 statically
    shifted variants stays fully vectorised.
    """
    out = _static_shift(arr, lo, fill)
    for v in range(lo + 1, hi + 1):
        out = jnp.where(s == v, _static_shift(arr, v, fill), out)
    return out


def _onehot5(codes: jax.Array, W: int) -> jax.Array:
    """(W,) int codes -> (5, W) f32 one-hot.

    Emission lookups run as one-hot contractions instead of jnp.take:
    small-table gathers lower to scalar loops on TPU and dominated the
    step time (measured ~50-350us/step vs ~2us compute).
    """
    return (
        codes[None, :].astype(jnp.int32)
        == lax.broadcasted_iota(jnp.int32, (5, W), 0)
    ).astype(jnp.float32)


def _valid_mask(k, o_k, m, n, W):
    b = lax.broadcasted_iota(jnp.int32, (W,), 0)
    j = o_k + b
    i = k - j
    return ((j >= 0) & (j <= n) & (i >= 0) & (i <= m)).astype(jnp.float32)


# --------------------------------------------------------------------- #
# Forward
# --------------------------------------------------------------------- #
def _kahan_add(hi, c, x):
    """Compensated accumulation: value represented is ``hi - c``.

    The log-scale accumulators grow to O(K) nats with O(K * eps * |hi|)
    plain-f32 rounding; since EM factors exponentiate
    ``lsf + lsb - loglik``, that absolute error lands in the EXPONENT —
    at K ~ 10^4 diagonals it reaches O(1)-O(10) nats and the
    expectations come out orders of magnitude off (the round-1
    "phase-B wrong on hardware" finding was exactly this, not a
    miscompile).  Kahan compensation bounds the error at ~eps * |hi|
    independent of K.
    """
    y = x - c
    t = hi + y
    c_new = (t - hi) - y
    return t, c_new


def _make_fwd_step(params: KernelParams, m, n, k_end, W: int,
                   store_lattice: bool):
    """The per-anti-diagonal forward step, shared by the full-lattice scan
    and the segmented/rematerialised EM path.

    Carry: (prev, prevprev, prev_inv, ls, c, fin_end, loglik) —
    prev_inv is the LINEAR 1/safe of the previous diagonal's rescale
    (replacing exp(ls2 - ls1): TPU log/exp carry small absolute biases
    that accumulate over 10^4 diagonals; the linear ratio is exact to
    f32 rounding); (ls, c) is the Kahan pair of the running log-scale
    (used only for the final loglik); fin_end is the band-start state
    mass captured at k_end (seeds the backward g-factor product, see
    _make_bwd_step).
    """
    t = params.t
    e_match = params.e_match_flat.reshape(5, 5)
    e_gap = params.e_gap_flat.reshape(5, 5)

    def step(carry, xs):
        prev, prevprev, prev_inv, ls1, c1, fin_end, loglik = carry
        k, o_k, d1, d2, x_cur, y_cur = xs

        oh_x = _onehot5(x_cur, W)
        oh_y = _onehot5(y_cur, W)
        # precision="highest": default TPU matmul rounds inputs to
        # bf16; that per-step state rounding accumulates O(K) nats of
        # bias in the running log-scales, which the EM factors
        # exponentiate (measured 10-24x trans error at K=10^4 on v5e)
        e_m = (jnp.matmul(e_match, oh_y, precision="highest")
               * oh_x).sum(axis=0)
        gx = jnp.matmul(e_gap, oh_x, precision="highest")  # (5, W) dels
        gy = jnp.matmul(e_gap, oh_y, precision="highest")  # (5, W) ins

        # prev is scaled by safe_{k-1} relative to prevprev: undo it
        diag_pred = _shift_sel(prevprev, d2, -1, 1) * prev_inv
        left_pred = _shift_sel(prev, d1 - 1, -1, 0)
        up_pred = _shift_sel(prev, d1, 0, 1)

        new_m = e_m * jnp.einsum("s,sw->w", t[:, 0], diag_pred, precision="highest")
        new_d1 = gx[1] * jnp.einsum("s,sw->w", t[:, 1], left_pred, precision="highest")
        new_i1 = gy[2] * jnp.einsum("s,sw->w", t[:, 2], up_pred, precision="highest")
        new_d2 = gx[3] * jnp.einsum("s,sw->w", t[:, 3], left_pred, precision="highest")
        new_i2 = gy[4] * jnp.einsum("s,sw->w", t[:, 4], up_pred, precision="highest")
        new = jnp.stack([new_m, new_d1, new_i1, new_d2, new_i2])
        new = new * _valid_mask(k, o_k, m, n, W)[None, :]

        scale = jnp.max(new)
        safe = jnp.where(scale > 0, scale, 1.0)
        inv = 1.0 / safe
        new = new * inv
        ls_new, c_new = _kahan_add(ls1, c1, jnp.log(safe))

        fin = jnp.sum(new[:, 0])
        is_end = k == k_end
        fin_end = jnp.where(is_end, jnp.maximum(fin, 1e-37), fin_end)
        loglik = loglik + jnp.where(
            is_end,
            jnp.log(jnp.maximum(fin, 1e-37)) + (ls_new - c_new),
            0.0,
        )
        out = (new, inv) if store_lattice else None
        return (new, prev, inv, ls_new, c_new, fin_end, loglik), out

    return step


def _fwd_start(W: int) -> jax.Array:
    start = jnp.full((NUM_STATES, W), 0.0, jnp.float32)
    return start.at[:, 0].set(1.0 / NUM_STATES)


def _fwd_carry_init(W: int):
    return (
        _fwd_start(W),
        jnp.zeros((NUM_STATES, W), jnp.float32),
        1.0,  # prev_inv
        0.0, 0.0,  # (ls, c)
        1.0,  # fin_end
        0.0,  # loglik
    )


def _forward_scan_single(params: KernelParams, batch_elem, store_lattice: bool):
    """Forward over one read.

    Returns (loglik, fin_end, f_hat[K+1,5,W], sfinv[K+1]) — sfinv is the
    per-diagonal rescale INVERSE (linear), fin_end the band-start state
    mass at k_end; both feed the backward g-factor product.
    """
    xc, yc, xn, yn, offsets, m, n, k_end, W = batch_elem
    K = offsets.shape[0] - 1

    start = _fwd_start(W)
    step = _make_fwd_step(params, m, n, k_end, W, store_lattice)

    ks = jnp.arange(1, K + 1)
    o_k = offsets[1:]
    d1 = offsets[1:] - offsets[:-1]
    # o[k-2] for k = 1..K  ->  [o[-1]:=0, o[0], ..., o[K-2]]
    o_km2 = jnp.concatenate([jnp.zeros((1,), jnp.int32), offsets[:-2]])
    d2 = o_k - o_km2 - 1
    xs = (ks, o_k, d1, d2, xc[1:], yc[1:])
    init = _fwd_carry_init(W)
    (fin_carry), ys = lax.scan(step, init, xs, unroll=SCAN_UNROLL)
    loglik = fin_carry[-1]
    fin_end = fin_carry[-2]
    if store_lattice:
        f_hat, sfinv = ys
        # prepend diagonal 0 (unscaled: inverse 1)
        f_all = jnp.concatenate([start[None], f_hat], axis=0)
        sfinv_all = jnp.concatenate([jnp.ones((1,)), sfinv], axis=0)
        return loglik, fin_end, f_all, sfinv_all
    return loglik, fin_end, None, None


@functools.partial(jax.jit, static_argnames=("band_width",))
def _forward_loglik_jit(params, xc, yc, xn, yn, offsets, m, n, k_end,
                        band_width):
    fn = lambda *elem: _forward_scan_single(
        params, (*elem, band_width), store_lattice=False
    )[0]
    return jax.vmap(fn)(xc, yc, xn, yn, offsets, m, n, k_end)


def forward_loglik(batch: BandedBatch, params: KernelParams) -> jax.Array:
    """Batched banded forward log-likelihood, shape (B,)."""
    return _forward_loglik_jit(
        params, batch.xc, batch.yc, batch.xn, batch.yn, batch.offsets,
        batch.m, batch.n, batch.k_end, batch.band_width,
    )


# --------------------------------------------------------------------- #
# Forward-backward: posterior bands + EM expectations
# --------------------------------------------------------------------- #
def _make_bwd_step(params: KernelParams, fin_end, m, n, k_end, W: int,
                   emit_gammas: bool):
    """The per-anti-diagonal backward/EM step, shared by the full-lattice
    scan and the segmented/rematerialised EM path.

    The EM factor exp(lsf_k + lsb_k - loglik) is maintained as a LINEAR
    running product G (the "g-factor"):

        G_{k_end} = 1 / fin_end              (= exp(lsf_end - loglik))
        ft_k      = G_{k+1} * sfinv_{k+1}    (transition factor at k)
        G_k       = ft_k * safe_b_k

    using the per-diagonal forward rescale inverses (sfinv, streamed in
    xs) and backward rescale factors — all linear-space quantities.
    The previous formulation exponentiated differences of O(K)-nat log
    sums; TPU log/exp carry small ABSOLUTE biases that accumulate over
    10^4 diagonals into O(1)-O(10) nats of exponent error (measured
    10-24x on trans/score at L=5000 on v5e while CPU was exact).  The
    product form is exact to f32 rounding per step and needs no
    transcendentals at all.
    """
    t = params.t
    e_match = params.e_match_flat.reshape(5, 5)
    e_gap = params.e_gap_flat.reshape(5, 5)
    inv_fin = 1.0 / fin_end

    def step(carry, xs):
        bnext, bnext2, prev_inv_b, prev_sfinv, g_next, trans, e16, edel, \
            eins = carry
        k, o_k, d1n, d2n2, f_hat, sfinv, x_next, y_next, x_cur, y_cur = xs

        oh_xn = _onehot5(x_next, W)
        oh_yn = _onehot5(y_next, W)
        e_m_next = (jnp.matmul(e_match, oh_yn, precision="highest")
                    * oh_xn).sum(axis=0)
        gx_next = jnp.matmul(e_gap, oh_xn, precision="highest")
        gy_next = jnp.matmul(e_gap, oh_yn, precision="highest")
        e_d1_next, e_d2_next = gx_next[1], gx_next[3]
        e_i1_next, e_i2_next = gy_next[2], gy_next[4]

        # bnext2 is scaled by safe_b_{k+1} relative to bnext: undo it
        bM_dest = _shift_sel(bnext2[0], -d2n2, -1, 1) * prev_inv_b * e_m_next
        bD1_dest = _shift_sel(bnext[1], 1 - d1n, 0, 1) * e_d1_next
        bD2_dest = _shift_sel(bnext[3], 1 - d1n, 0, 1) * e_d2_next
        bI1_dest = _shift_sel(bnext[2], -d1n, -1, 0) * e_i1_next
        bI2_dest = _shift_sel(bnext[4], -d1n, -1, 0) * e_i2_next

        dest = jnp.stack([bM_dest, bD1_dest, bI1_dest, bD2_dest, bI2_dest])
        new = jnp.einsum("st,tw->sw", t, dest, precision="highest")
        new = new * _valid_mask(k, o_k, m, n, W)[None, :]

        # inject the end condition at k == m + n
        end_band = jnp.zeros((NUM_STATES, W), jnp.float32).at[:, 0].set(1.0)
        is_end = k == k_end
        new = jnp.where(is_end, end_band, new)

        scale = jnp.max(new)
        safe = jnp.where(scale > 0, scale, 1.0)
        inv_b = 1.0 / safe
        new = new * inv_b

        # ---- EM transition expectations (moves out of diagonal k) ----
        # dest[t, b] = e_t(dest cell) * b_t(dest cell) at b's running
        # scale; f_hat at the forward running scale.
        factor_trans = g_next * prev_sfinv
        trans = trans + t * jnp.einsum(
            "sw,tw->st", f_hat, dest, precision="highest"
        ) * factor_trans

        # ---- posterior occupancy of diagonal k ----
        g_k = jnp.where(is_end, inv_fin, factor_trans * safe)
        g_k = jnp.minimum(g_k, 3e37)  # keep dead lanes finite
        gamma = f_hat * new * g_k  # (5, W)

        oh4_x = _onehot5(x_cur, W)[:4]  # (4, W): N columns drop out
        oh4_y = _onehot5(y_cur, W)[:4]
        e16 = e16 + jnp.einsum(
            "w,aw,bw->ab", gamma[0], oh4_x, oh4_y, precision="highest"
        ).reshape(16)
        edel = edel + jnp.stack([
            jnp.matmul(oh4_x, gamma[1], precision="highest"),
            jnp.matmul(oh4_x, gamma[3], precision="highest"),
        ])
        eins = eins + jnp.stack([
            jnp.matmul(oh4_y, gamma[2], precision="highest"),
            jnp.matmul(oh4_y, gamma[4], precision="highest"),
        ])

        out = (
            (gamma[0], gamma[1] + gamma[3], gamma[2] + gamma[4])
            if emit_gammas
            else None
        )
        return (
            (new, bnext, inv_b, sfinv, g_k, trans, e16, edel, eins),
            out,
        )

    return step


def _bwd_xs_arrays(offsets):
    """Per-diagonal backward inputs in forward (k ascending) order.

    d1n[k] = o[k+1] - o[k] (0 at k = K); d2n2[k] = o[k+2] - o[k] - 1
    (0 for k >= K-1).  The backward scan consumes these reversed.
    """
    K = offsets.shape[0] - 1
    d1_all = jnp.diff(offsets)
    d1n = jnp.concatenate([d1_all, jnp.zeros((1,), jnp.int32)])
    d2_full = offsets[2:] - offsets[:-2] - 1
    d2n2 = jnp.concatenate([d2_full, jnp.zeros((2,), jnp.int32)])
    return d1n, d2n2


def _bwd_init(W: int):
    return (
        jnp.zeros((NUM_STATES, W), jnp.float32),
        jnp.zeros((NUM_STATES, W), jnp.float32),
        1.0,  # prev_inv_b (1/safe_b of the diagonal above)
        1.0,  # prev_sfinv (forward rescale inverse of the diag above)
        0.0,  # g_next (g-factor of the diagonal above; 0 until k_end)
        jnp.zeros((5, 5), jnp.float32),
        jnp.zeros((16,), jnp.float32),
        jnp.zeros((2, 4), jnp.float32),
        jnp.zeros((2, 4), jnp.float32),
    )


def _emis_from_parts(e16, edel, eins):
    emis = jnp.zeros((5, 16), jnp.float32)
    emis = emis.at[0].set(e16)
    emis = emis.at[1].set(jnp.repeat(edel[0] / 4.0, 4))
    emis = emis.at[3].set(jnp.repeat(edel[1] / 4.0, 4))
    emis = emis.at[2].set(jnp.tile(eins[0] / 4.0, 4))
    emis = emis.at[4].set(jnp.tile(eins[1] / 4.0, 4))
    return emis


def _forward_backward_single(params: KernelParams, batch_elem):
    """Full fwd/bwd for one read.

    Returns dict with:
      loglik: scalar
      gamma_match / gamma_del / gamma_ins: (K+1, W) posterior bands, where
        entry [k, b] refers to lattice cell (i, j) = (k - j, offsets[k]+b)
        i.e. aligned pair (readPos i-1, refPos j-1) for gamma_match.
      trans: (5, 5) expected transition counts
      emis:  (5, 16) expected emission counts
    """
    xc, yc, xn, yn, offsets, m, n, k_end, W = batch_elem
    K = offsets.shape[0] - 1

    loglik, fin_end, f_all, sfinv_all = _forward_scan_single(
        params, batch_elem, store_lattice=True
    )

    # scan k from K down to 0
    step = _make_bwd_step(params, fin_end, m, n, k_end, W, emit_gammas=True)

    ks = jnp.arange(K, -1, -1)
    o_k = offsets[::-1]
    d1n_fwd, d2n2_fwd = _bwd_xs_arrays(offsets)
    xs = (
        ks, o_k, d1n_fwd[::-1], d2n2_fwd[::-1], f_all[::-1],
        sfinv_all[::-1],
        xn[::-1], yn[::-1], xc[::-1], yc[::-1],
    )

    carry, gammas_rev = lax.scan(step, _bwd_init(W), xs, unroll=SCAN_UNROLL)
    trans, e16, edel, eins = carry[-4:]

    gamma_match = gammas_rev[0][::-1]
    gamma_del = gammas_rev[1][::-1]
    gamma_ins = gammas_rev[2][::-1]

    emis = _emis_from_parts(e16, edel, eins)

    return {
        "loglik": loglik,
        "gamma_match": gamma_match,
        "gamma_del": gamma_del,
        "gamma_ins": gamma_ins,
        "trans": trans,
        "emis": emis,
    }


@functools.partial(jax.jit, static_argnames=("band_width",))
def _forward_backward_jit(params, xc, yc, xn, yn, offsets, m, n, k_end,
                          band_width):
    fn = lambda *elem: _forward_backward_single(
        params, (*elem, band_width)
    )
    return jax.vmap(fn)(xc, yc, xn, yn, offsets, m, n, k_end)


def forward_backward(batch: BandedBatch, params: KernelParams) -> dict:
    """Batched banded forward-backward.

    Returns dict of batched arrays: loglik (B,), gamma_match/del/ins
    (B, K+1, W), trans (B,5,5), emis (B,5,16).

    WARNING (round-3 hardware finding, scripts_dev/gamma_probe.py): on
    TPU backends XLA compiles this scan such that ~0.03% of gamma band
    cells come out wrong by up to ~170 at K=10000 (CPU is exact vs the
    C++ oracle, and the fused Pallas emit_gamma stream matches the
    oracle to ~1e-5 on the same hardware).  Posterior consumers on TPU
    must take the Pallas route (ops.dispatch.PreparedPosteriors does);
    this function is the CPU/virtual-mesh backend.
    """
    # fail-safe, not warn-only: on TPU backends this raises unless the
    # NANOPORE_TPU_ALLOW_TPU_GAMMA probe escape hatch is set — corrupt
    # gammas must never reach posterior consumers silently
    from nanopore_tpu.ops.dispatch import require_gamma_safe_backend

    require_gamma_safe_backend(batch.band_width)
    return _forward_backward_jit(
        params, batch.xc, batch.yc, batch.xn, batch.yn, batch.offsets,
        batch.m, batch.n, batch.k_end, batch.band_width,
    )


# --------------------------------------------------------------------- #
# Segmented / rematerialised EM expectations
# --------------------------------------------------------------------- #
def _em_expectations_single(params: KernelParams, batch_elem,
                            segment_size: int):
    """EM expectations with O(K/C + C) memory instead of O(K).

    The full fwd/bwd stores the whole (K+1, 5, W) forward lattice —
    ~96 MB for a 75 kb read at W=64, which caps EM batch sizes.  Here the
    forward pass stores only one carry per C-diagonal segment; the
    backward pass recomputes each segment's forward lattice from its
    boundary carry just before consuming it (classic checkpointed-scan
    rematerialisation, ~1.33x forward FLOPs).  Gammas are never
    materialised — EM only needs the (5,5)+(5,16) accumulators.
    """
    xc, yc, xn, yn, offsets, m, n, k_end, W = batch_elem
    K = offsets.shape[0] - 1
    C = int(segment_size)
    S = -(-K // C)
    K_pad = S * C
    pad = K_pad - K
    if pad:
        # diagonals past K are invalid everywhere (valid_mask zeroes
        # them); constant offset extension keeps d1/d2 in range
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
        return out_carry, carry  # emit the segment's INCOMING carry

    init = _fwd_carry_init(W)
    fin_carry, boundaries = lax.scan(seg_fwd, init, fxs_seg)
    loglik = fin_carry[-1]
    fin_end = fin_carry[-2]

    bwd_step = _make_bwd_step(params, fin_end, m, n, k_end, W,
                              emit_gammas=False)
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
        new_carry, _ = lax.scan(bwd_step, carry, xs, unroll=SCAN_UNROLL)
        return new_carry, None

    carry, _ = lax.scan(seg_bwd, _bwd_init(W), (bnd_rev, bxs_rev, fxs_rev))
    # diagonal 0: forward value is the start tile at zero log-scale
    xs0 = (jnp.int32(0), offsets[0], d1n[0], d2n2[0],
           _fwd_start(W), jnp.float32(1.0), xn[0], yn[0], xc[0], yc[0])
    carry, _ = bwd_step(carry, xs0)
    trans, e16, edel, eins = carry[-4:]
    return {
        "loglik": loglik,
        "trans": trans,
        "emis": _emis_from_parts(e16, edel, eins),
    }


@functools.partial(jax.jit, static_argnames=("band_width", "segment_size"))
def _em_expectations_jit(params, xc, yc, xn, yn, offsets, m, n, k_end,
                         band_width, segment_size):
    fn = lambda *elem: _em_expectations_single(
        params, (*elem, band_width), segment_size
    )
    return jax.vmap(fn)(xc, yc, xn, yn, offsets, m, n, k_end)


def em_expectations(batch: BandedBatch, params: KernelParams,
                    segment_size: int = 512) -> dict:
    """Batched EM expectations via the rematerialised backward.

    Same trans/emis/loglik as forward_backward (oracle-tested) without
    the O(K) stored lattice or gamma outputs — use for Baum-Welch on
    long reads / large batches.
    """
    return _em_expectations_jit(
        params, batch.xc, batch.yc, batch.xn, batch.yn, batch.offsets,
        batch.m, batch.n, batch.k_end, batch.band_width, int(segment_size),
    )


def extract_posterior_pairs(
    gamma_match: np.ndarray,
    offsets: np.ndarray,
    m: int,
    n: int,
    threshold: float = 1e-3,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Band -> (readPos, refPos, prob) triples on the host.

    Equivalent of cactus_realign --outputAllPosteriorProbs (reference
    marginAlignSnpCaller.py:136-146): probabilities that read base i-1
    aligns to ref base j-1 for lattice cells (i,j).
    """
    K1, W = gamma_match.shape
    ks = np.arange(K1)[:, None]
    bs = np.arange(W)[None, :]
    j = offsets[:K1, None] + bs
    i = ks - j
    mask = (gamma_match > threshold) & (i >= 1) & (i <= m) & (j >= 1) & (j <= n)
    return (
        (i[mask] - 1).astype(np.int64),
        (j[mask] - 1).astype(np.int64),
        np.asarray(gamma_match)[mask],
    )
