"""Device-side consumers of posterior match-probability bands.

The reference exposes pair-HMM posteriors through three cactus_realign
flags (reference /root/reference/nanopore/analyses/utils.py:587,
analyses/alignmentUncertainty.py:41-42,
analyses/marginAlignSnpCaller.py:136-146):

* ``--rescoreByPosteriorProbIgnoringGaps`` — average posterior match
  probability over a cigar's aligned pairs (AlignmentUncertainty);
* ``--outputAllPosteriorProbs`` — every (readPos, refPos, prob) triple,
  which the SNP caller reduces to per-reference-position expected base
  counts (marginAlignSnpCaller.py:149-155).

Both are served here as reductions over the (B, K+1, W) gamma_match
band WITHOUT downloading it: the band stays on device (it is either
streamed out of the fused Pallas kernel, ops/pairhmm_pallas_realign
``emit_gamma``, or produced by the XLA forward_backward), and only tiny
reduction outputs cross to the host —

* rescore: a one-hot band contraction per diagonal (never a gather,
  CLAUDE.md perf rule 2) summed over the path cells → (B,) totals;
* expectations: a band-following accumulator scanned over diagonals
  that RETIRES one reference position per band shift (the band is
  Lipschitz-1, so each shift permanently finalises the column leaving
  the band) → a (B, K+1, 4) retired stream plus a (B, 4, W) final
  flush, which the host scatters into the per-position expectation
  matrix with plain monotone indexing.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from nanopore_tpu.io.sam import CIG


def path_band_indices(
    cigar: list[tuple[int, int]],
    offsets: np.ndarray,
    band_width: int,
) -> tuple[np.ndarray, int]:
    """Band index of each aligned pair's lattice cell, per diagonal.

    Returns (pb (K+1,) int32 with -1 where the cigar has no aligned
    pair on that diagonal or the pair is off-band, count) where count
    is the TOTAL number of aligned pairs (off-band pairs contribute 0
    posterior but still count — rescore_by_posterior semantics).
    """
    offsets = np.asarray(offsets)
    K1 = offsets.shape[0]
    pb = np.full(K1, -1, np.int32)
    i = j = 0
    count = 0
    for op, length in cigar:
        if op in (CIG.M, CIG.EQ, CIG.X):
            ii = i + np.arange(1, length + 1)
            jj = j + np.arange(1, length + 1)
            kk = ii + jj
            bb = jj - offsets[kk]
            inb = (bb >= 0) & (bb < band_width)
            pb[kk[inb]] = bb[inb]
            count += length
            i += length
            j += length
        elif op == CIG.I:
            i += length
        elif op in (CIG.D, CIG.N):
            j += length
    return pb, count


@jax.jit
def _rescore_totals_jit(gm, pb):
    """(B, K1, W) gamma x (B, K1) band indices -> (B,) posterior sums."""
    W = gm.shape[-1]
    lanes = jnp.arange(W, dtype=jnp.int32)
    oh = lanes[None, None, :] == pb[:, :, None]
    return jnp.sum(jnp.where(oh, gm, 0.0), axis=(1, 2))


def rescore_cigars(
    gm, offsets: np.ndarray, cigars: list[list[tuple[int, int]]],
    band_width: int,
) -> list[float]:
    """Batched --rescoreByPosteriorProbIgnoringGaps over device bands.

    ``gm`` may (should) live on device; only (B,) floats cross to the
    host.  Semantics pinned to ops.mea.rescore_by_posterior.
    """
    offsets = np.asarray(offsets)
    K1 = min(offsets.shape[1], int(np.asarray(gm.shape)[1]))
    pbs, counts = [], []
    for b, cig in enumerate(cigars):
        pb, count = path_band_indices(cig, offsets[b], band_width)
        pbs.append(pb[:K1])
        counts.append(count)
    totals = np.asarray(
        _rescore_totals_jit(
            jnp.asarray(gm)[:, :K1], jnp.asarray(np.stack(pbs))
        )
    )
    return [
        float(t) / c if c else float("nan")
        for t, c in zip(totals, counts)
    ]


@functools.partial(jax.jit, static_argnames=("threshold",))
def _expectation_streams_jit(gm, yc, d1, threshold):
    """Band-following expectation accumulator.

    gm (B, K1, W) f32, yc (B, K1, W) int8 read codes y[i-1] at the band
    cells, d1 (B, K1) int32 band offset deltas (d1[k] = o[k] - o[k-1],
    d1[0] = 0).  Returns (retired (B, K1, 4), flush (B, 4, W)): at every
    step with d1 == 1 the column leaving the band is emitted — it holds
    the finished expectation vector of reference position o[k] - 2 —
    and after the last diagonal the surviving W columns hold positions
    o[K] - 1 .. o[K] + W - 2.
    """
    from nanopore_tpu.ops.pairhmm import SCAN_UNROLL

    B, K1, W = gm.shape

    def one_read(gm_r, yc_r, d1_r):
        def step(acc, xs):
            gm_k, yc_k, d1_k = xs
            retired = acc[:, 0] * d1_k.astype(jnp.float32)
            shifted = jnp.concatenate(
                [acc[:, 1:], jnp.zeros((4, 1), jnp.float32)], axis=1
            )
            acc = jnp.where(d1_k > 0, shifted, acc)
            gmz = jnp.where(gm_k > threshold, gm_k, 0.0)
            yc32 = yc_k.astype(jnp.int32)
            contrib = jnp.stack(
                [jnp.where(yc32 == base, gmz, 0.0) for base in range(4)]
            )
            return acc + contrib, retired

        acc0 = jnp.zeros((4, W), jnp.float32)
        acc, retired = lax.scan(
            step, acc0, (gm_r, yc_r, d1_r), unroll=SCAN_UNROLL
        )
        return retired, acc

    return jax.vmap(one_read)(gm, yc, d1)


def expectation_streams(gm, yc, offsets: np.ndarray, threshold: float = 1e-3):
    """Run the device accumulator.  offsets is the HOST (B, K1) array."""
    offsets = np.asarray(offsets)
    K1 = int(np.asarray(gm.shape)[1])
    d1 = np.zeros((offsets.shape[0], K1), np.int32)
    d1[:, 1:] = offsets[:, 1:K1] - offsets[:, : K1 - 1]
    retired, flush = _expectation_streams_jit(
        jnp.asarray(gm), jnp.asarray(yc), jnp.asarray(d1), float(threshold)
    )
    return np.asarray(retired), np.asarray(flush), d1


def accumulate_expectations(
    expectations: np.ndarray,  # (P, 4) accumulated in place
    retired: np.ndarray,  # (K1, 4) one read's retired stream
    flush: np.ndarray,  # (4, W) its final band columns
    offsets: np.ndarray,  # (K1,) its band offsets
    d1: np.ndarray,  # (K1,) its offset deltas
    n: int,  # its reference window length
    goff: int = 0,  # global offset of the window in `expectations`
) -> None:
    """Scatter one read's streams into the per-position matrix.

    Each retired entry / flush column belongs to a DISTINCT reference
    position (the band retires each column exactly once), so plain
    advanced indexing adds suffice — no np.add.at.
    """
    K1 = retired.shape[0]
    offsets = np.asarray(offsets)[:K1]
    ks = np.nonzero(d1[:K1] == 1)[0]
    pos = offsets[ks] - 2
    ok = (pos >= 0) & (pos < n)
    expectations[goff + pos[ok]] += retired[ks[ok]]
    W = flush.shape[1]
    fpos = offsets[K1 - 1] - 1 + np.arange(W)
    fok = (fpos >= 0) & (fpos < n)
    expectations[goff + fpos[fok]] += flush[:, fok].T


# --------------------------------------------------------------------- #
# Raw (k-major) layout twins: consume the Pallas kernel's native
# (NB, K1, W, BT) gamma/code tensors directly — no per-read band
# transpose (~1.7 GB of byte-shuffle at SNP shapes) and no vmapped
# scans over per-read slices.
# --------------------------------------------------------------------- #
def _lanes_layout(arr_2d: np.ndarray, NB: int, BT: int) -> np.ndarray:
    """(B, K1) host array -> (NB, K1, BT) matching raw lane order."""
    B, K1 = arr_2d.shape
    out = np.zeros((NB * BT, K1), arr_2d.dtype)
    out[:B] = arr_2d
    return np.ascontiguousarray(
        out.reshape(NB, BT, K1).transpose(0, 2, 1)
    )


@jax.jit
def _rescore_totals_raw_jit(gm_raw, pb):
    """gm_raw (NB, K1, W, BT) x pb (NB, K1, BT) -> (NB, BT) sums."""
    W = gm_raw.shape[2]
    lanes = jnp.arange(W, dtype=jnp.int32)[None, None, :, None]
    oh = lanes == pb[:, :, None, :]
    return jnp.sum(jnp.where(oh, gm_raw, 0.0), axis=(1, 2))


def rescore_cigars_raw(
    gm_raw, offsets: np.ndarray, cigars, band_width: int
) -> list[float]:
    """Raw-layout --rescoreByPosteriorProbIgnoringGaps."""
    NB, K1g, W, BT = gm_raw.shape
    offsets = np.asarray(offsets)
    K1 = min(offsets.shape[1], K1g)
    pbs, counts = [], []
    for cig in cigars:
        pb, count = path_band_indices(cig, offsets[len(pbs)], band_width)
        pbs.append(pb[:K1])
        counts.append(count)
    pb_l = _lanes_layout(np.stack(pbs), NB, BT)
    if K1 < K1g:  # pad rows select nothing
        pad = np.full((NB, K1g - K1, BT), -1, np.int32)
        pb_l = np.concatenate([pb_l, pad], axis=1)
    totals = np.asarray(
        _rescore_totals_raw_jit(jnp.asarray(gm_raw), jnp.asarray(pb_l))
    ).reshape(-1)
    return [
        float(totals[b]) / c if c else float("nan")
        for b, c in enumerate(counts)
    ]


@functools.partial(jax.jit, static_argnames=("threshold",))
def _expectation_streams_raw_jit(gm_raw, yc_raw, d1_t, threshold):
    """Raw band-following accumulator: ONE scan over diagonals, lanes
    stay in the kernel layout (no vmap over per-read slices).

    gm_raw/yc_raw (NB, K1, W, BT), d1_t (K1, NB, BT).  Returns
    (retired (K1, NB, 4, BT), flush (NB, 4, W, BT)).
    """
    from nanopore_tpu.ops.pairhmm import SCAN_UNROLL

    NB, K1, W, BT = gm_raw.shape
    gm_t = lax.optimization_barrier(
        jnp.transpose(gm_raw, (1, 0, 2, 3))
    )
    yc_t = lax.optimization_barrier(
        jnp.transpose(yc_raw, (1, 0, 2, 3)).astype(jnp.int32)
    )

    def step(acc, xs):
        gm_k, yc_k, d1_k = xs
        d1f = d1_k.astype(jnp.float32)[:, None, :]  # (NB, 1, BT)
        retired = acc[:, :, 0, :] * d1f
        shifted = jnp.concatenate(
            [acc[:, :, 1:, :], jnp.zeros((NB, 4, 1, BT), jnp.float32)],
            axis=2,
        )
        acc = jnp.where(d1_k[:, None, None, :] > 0, shifted, acc)
        gmz = jnp.where(gm_k > threshold, gm_k, 0.0)
        contrib = jnp.stack(
            [
                jnp.where(yc_k == base, gmz, 0.0)
                for base in range(4)
            ],
            axis=1,
        )  # (NB, 4, W, BT)
        return acc + contrib, retired

    acc0 = jnp.zeros((NB, 4, W, BT), jnp.float32)
    acc, retired = lax.scan(
        step, acc0, (gm_t, yc_t, d1_t), unroll=SCAN_UNROLL
    )
    return retired, acc


def posterior_expectations_raw(
    gm_raw, yc_raw, offsets: np.ndarray, ns: np.ndarray,
    threshold: float = 1e-3,
) -> list[np.ndarray]:
    """Per-read (n, 4) expected base-count matrices from raw bands."""
    NB, K1g, W, BT = gm_raw.shape
    offsets = np.asarray(offsets)
    B = len(ns)
    K1 = min(offsets.shape[1], K1g)
    offs = np.zeros((B, K1g), np.int32)
    offs[:, :K1] = offsets[:, :K1]
    if K1 < K1g:
        offs[:, K1:] = offsets[:, -1:]
    d1 = np.zeros((B, K1g), np.int32)
    d1[:, 1:] = offs[:, 1:] - offs[:, :-1]
    d1_t = np.ascontiguousarray(
        _lanes_layout(d1, NB, BT).transpose(1, 0, 2)
    )  # (K1, NB, BT)
    retired, flush = _expectation_streams_raw_jit(
        jnp.asarray(gm_raw), jnp.asarray(yc_raw), jnp.asarray(d1_t),
        float(threshold),
    )
    # (K1, NB, 4, BT) -> (B, K1, 4); (NB, 4, W, BT) -> (B, 4, W)
    retired = (
        np.asarray(retired).transpose(1, 3, 0, 2).reshape(NB * BT, K1g, 4)
    )
    flush = np.asarray(flush).transpose(0, 3, 1, 2).reshape(NB * BT, 4, W)
    out = []
    for b in range(B):
        n = int(ns[b])
        e = np.zeros((n, 4), np.float32)
        accumulate_expectations(
            e, retired[b], flush[b], offs[b], d1[b], n
        )
        out.append(e)
    return out


@jax.jit
def _ret_f16(a):
    return a.astype(jnp.float16)


def posterior_expectations_fused(
    ret_raw, flush_raw, offsets: np.ndarray, ns: np.ndarray,
    band_width: int,
) -> list[np.ndarray]:
    """Per-read (n, 4) expectation matrices from the KERNEL-FUSED
    retire stream (ops.pairhmm_pallas_realign ``emit_exp``).

    The fused accumulator runs DESCENDING inside the backward sweep:
    ret row k holds the column retired on the k+1 -> k transition —
    reference position ``o[k+1] + W - 2``, valid where ``d1[k+1] = 1``
    — and the flush columns hold positions ``w - 1``.  Only these
    ~16 bytes/diagonal (plus the flush) cross to the host, replacing
    the XLA retire scan + full retired-band download.
    """
    import os

    if (
        isinstance(ret_raw, jax.Array)
        and os.environ.get("NANOPORE_TPU_RET_F32") != "1"
    ):
        # halve the device->host bytes: expected base counts are sums
        # of <= W thresholded gammas, so f16's ~1e-3 relative error is
        # far below the SNP caller's decision margins; the pull is the
        # dominant cost of the fused route on bandwidth-limited links
        ret_raw = _ret_f16(ret_raw)
    ret = np.asarray(ret_raw).astype(np.float32)  # (NB, K1g, 4, BT)
    fl = np.asarray(flush_raw)  # (NB, 4, W, BT)
    NB, K1g, _, BTl = ret.shape
    W = band_width
    retired = ret.transpose(0, 3, 1, 2).reshape(NB * BTl, K1g, 4)
    flush = fl.transpose(0, 3, 1, 2).reshape(NB * BTl, 4, W)
    offsets = np.asarray(offsets)
    out = []
    fpos = np.arange(W) - 1
    for b in range(len(ns)):
        n = int(ns[b])
        o = offsets[b]
        kmax = min(len(o) - 1, K1g - 1)
        d1 = o[1 : kmax + 1] - o[:kmax]  # d1[k+1] at index k
        rows = np.nonzero(d1)[0]
        pos = o[rows + 1] + W - 2
        ok = (pos >= 0) & (pos < n)
        e = np.zeros((n, 4), np.float32)
        # each retired row / flush column is a DISTINCT position (the
        # band retires each column exactly once) — plain indexed adds
        e[pos[ok]] += retired[b, rows[ok]]
        fok = (fpos >= 0) & (fpos < n)
        e[fpos[fok]] += flush[b][:, fok].T
        out.append(e)
    return out


def rescore_from_post(post: dict, offsets, cigars, band_width: int):
    """Layout-agnostic rescore over a PreparedPosteriors run() output."""
    if "gamma_raw" in post:
        return rescore_cigars_raw(
            post["gamma_raw"], offsets, cigars, band_width
        )
    return rescore_cigars(post["gamma_match"], offsets, cigars, band_width)


def expectations_from_post(
    post: dict, offsets, ns, threshold: float = 1e-3,
    band_width: int | None = None,
):
    """Layout-agnostic posterior expectations over a run() output.

    Preference order: the kernel-fused retire stream (``ret_raw``,
    threshold applied IN KERNEL at plan build time — on that path the
    ``threshold`` argument here is IGNORED in favour of the plan's
    ``exp_threshold``; a mismatch logs a warning), then the raw gamma
    band scan, then the per-read band scan.
    """
    if "ret_raw" in post:
        plan_thr = post.get("exp_threshold")
        if plan_thr is not None and abs(plan_thr - threshold) > 1e-12:
            import logging

            logging.getLogger("nanopore_tpu").warning(
                "expectations_from_post: threshold=%g ignored on the "
                "fused ret_raw path (kernel applied the plan's "
                "exp_threshold=%g at build time)",
                threshold,
                plan_thr,
            )
        W = band_width or post["flush_raw"].shape[2]
        return posterior_expectations_fused(
            post["ret_raw"], post["flush_raw"], offsets, ns, W
        )
    if "gamma_raw" in post:
        return posterior_expectations_raw(
            post["gamma_raw"], post["yc_raw"], offsets, ns, threshold
        )
    return posterior_expectations_batch(
        post["gamma_match"], post["yc"], offsets, ns, threshold
    )


def posterior_expectations_batch(
    gm, yc, offsets: np.ndarray, ns: np.ndarray,
    threshold: float = 1e-3,
) -> list[np.ndarray]:
    """Per-read (n, 4) expected base-count matrices from device bands.

    The batched equivalent of running extract_posterior_pairs per read
    and accumulating prob into (refPos, readBase) — the SNP caller's
    posterior expectation update (marginAlignSnpCaller.py:149-155) —
    with only the (B, K1, 4) retired stream crossing to the host.
    """
    retired, flush, d1 = expectation_streams(gm, yc, offsets, threshold)
    out = []
    for b in range(retired.shape[0]):
        n = int(ns[b])
        # f32 keeps B×refLen×4 host matrices affordable at scale; the
        # caller's accumulation across reads is f64
        e = np.zeros((n, 4), np.float32)
        accumulate_expectations(
            e, retired[b], flush[b], offsets[b], d1[b], n
        )
        out.append(e)
    return out
