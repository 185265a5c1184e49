"""Pallas fused forward kernel for the banded pair-HMM.

The XLA-scan kernel (ops/pairhmm.py) is latency-bound at ~5us per
anti-diagonal step (while-loop dispatch overhead; the actual VPU work is
~0.3us at B=128).  This kernel runs the whole diagonal loop inside one
Pallas program: carries live in VMEM, band code chunks stream from HBM
with double-buffered DMA, and the model tables + per-step shift deltas
are scalar-prefetched into SMEM — removing the dispatch overhead
entirely.

Mosaic-friendly construction notes:
- no dot_general: emissions and transition sums are unrolled
  scalar-times-vector FMAs over SMEM table entries (the tables are tiny:
  25 + 36 + 30 scalars),
- no scatter / jnp.pad: masks via broadcasted_iota, shifts via
  pltpu.roll + edge masking,
- per-state carries are separate (W, B) tiles — W on sublanes, B on
  lanes, so (64, 128) f32 is exactly eight (8, 128) tiles and lane-dim
  reductions/broadcasts stay in natural layouts,
- DP state lives in ping-pong VMEM scratch, not fori_loop carries:
  iota-derived carry inits get lane/sublane-replicated layouts that
  Mosaic cannot unify with the loop body ("Invalid relayout" errors).

Validity is encoded in the codes themselves: out-of-lattice cells carry
code 5, whose one-hot is zero, so every arrival emission vanishes — no
separate mask pass.  (Rogue delete/insert mass outside the lattice can
never re-enter it: i and j are non-decreasing along forward moves.)

Forward-only (log-likelihood); the backward/EM path stays on the XLA
kernel.  Requires uniform band geometry across the batch.  Oracle-tested
against ops/pairhmm in interpret mode.

STATUS: EXPERIMENTAL — correct in interpret mode, but the first
hardware run measured ~4ms/step (dynamic-slot VMEM scratch indexing and
per-step output-ref read-modify-write lower to slow paths) vs 0.4us/step
for the tuned XLA scan, plus a numeric discrepancy to chase.  The XLA
kernel (ops/pairhmm.py, 1.5 Gcells/s fwd at B=128) remains the
production path; next iteration should unroll steps by 2 (static
ping-pong slots), accumulate loglik in registers, and move code chunks
in via the grid instead of in-kernel DMA.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanopore_tpu.ops.pairhmm import BandedBatch, KernelParams

NUM_STATES = 5
CHUNK = 256  # diagonals per DMA chunk


def _kernel(
    # scalar-prefetch (SMEM)
    d1_ref,  # (K_pad,) int32
    d2_ref,  # (K_pad,) int32
    tf_ref,  # (25,) f32 transitions [from*5+to]
    emf_ref,  # (36,) f32 match emissions [x*6+y], rows/cols 5 zero
    egf_ref,  # (30,) f32 gap emissions [state*6+base], col 5 zero
    # tensor inputs
    kend_ref,  # (1, B) int32 VMEM
    xc_ref,  # (K_pad, W, B) int8 HBM
    yc_ref,  # (K_pad, W, B) int8 HBM
    # outputs
    loglik_ref,  # (1, B) f32
    # scratch
    xbuf,  # (2, CHUNK, W, B) int8 VMEM
    ybuf,
    state,  # (2, NUM_STATES, W, B) f32 ping-pong DP state
    lsbuf,  # (2, 1, B) f32 running log-scales
    sems,  # (2, 2) DMA semaphores
    *,
    k_steps: int,
    B: int,
    W: int,
):
    n_chunks = k_steps // CHUNK

    def start_chunk_dma(slot, chunk_idx):
        start = chunk_idx * CHUNK
        pltpu.make_async_copy(
            xc_ref.at[pl.ds(start, CHUNK)], xbuf.at[slot], sems.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            yc_ref.at[pl.ds(start, CHUNK)], ybuf.at[slot], sems.at[slot, 1]
        ).start()

    def wait_chunk(slot, chunk_idx):
        start = chunk_idx * CHUNK
        pltpu.make_async_copy(
            xc_ref.at[pl.ds(start, CHUNK)], xbuf.at[slot], sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            yc_ref.at[pl.ds(start, CHUNK)], ybuf.at[slot], sems.at[slot, 1]
        ).wait()

    start_chunk_dma(0, 0)

    kend = kend_ref[:, :]  # (1, B) int32 — keep per-read values 2-D

    row = lax.broadcasted_iota(jnp.int32, (W, B), 0)

    def onehot6(codes):  # (W, B) int8 -> list of 6 (W, B) f32
        c = codes.astype(jnp.int32)
        return [(c == v).astype(jnp.float32) for v in range(6)]

    def shift_w(arr, s: int):
        """result[w, .] = arr[w+s, .] with zero fill (roll + edge mask)."""
        if s == 0:
            return arr
        rolled = pltpu.roll(arr, (-s) % W, 0)  # roll requires shift >= 0
        if s > 0:
            return jnp.where(row < W - s, rolled, 0.0)
        return jnp.where(row >= -s, rolled, 0.0)

    def sel_shift(arr, s, lo, hi):
        out = shift_w(arr, lo)
        for v in range(lo + 1, hi + 1):
            out = jnp.where(s == v, shift_w(arr, v), out)
        return out

    start_val = jnp.where(row == 0, 1.0 / NUM_STATES, 0.0)
    zeros = jnp.zeros((W, B), jnp.float32)
    zb = jnp.zeros((1, B), jnp.float32)

    # diagonal d lives in state slot d % 2; diag 0 = start, diag -1 = 0
    for st in range(NUM_STATES):
        state[0, st] = start_val
        state[1, st] = zeros
    lsbuf[0] = zb
    lsbuf[1] = zb
    loglik_ref[:, :] = zb

    def chunk_body(chunk_idx, _):
        @pl.when(chunk_idx + 1 < n_chunks)
        def _():
            start_chunk_dma((chunk_idx + 1) % 2, chunk_idx + 1)

        slot = chunk_idx % 2
        wait_chunk(slot, chunk_idx)

        def step_body(t_idx, _):
            k = chunk_idx * CHUNK + t_idx  # step k computes diagonal k+1
            slot_prev = k % 2  # diag k
            slot_new = (k + 1) % 2  # diag k+1, overwrites diag k-1
            prev = [state[slot_prev, st] for st in range(NUM_STATES)]
            prevprev = [state[slot_new, st] for st in range(NUM_STATES)]
            ls1 = lsbuf[slot_prev]
            ls2 = lsbuf[slot_new]
            loglik = loglik_ref[:, :]
            d1 = d1_ref[k]
            d2 = d2_ref[k]
            oh_x = onehot6(xbuf[slot, t_idx])
            oh_y = onehot6(ybuf[slot, t_idx])

            # emissions: unrolled scalar-FMA over SMEM tables
            e_m = zeros
            for a in range(5):  # row 5 of the table is zero
                inner = zeros
                for c in range(5):
                    inner = inner + emf_ref[a * 6 + c] * oh_y[c]
                e_m = e_m + oh_x[a] * inner
            gx1 = zeros
            gx3 = zeros
            gy2 = zeros
            gy4 = zeros
            for c in range(5):
                gx1 = gx1 + egf_ref[1 * 6 + c] * oh_x[c]
                gx3 = gx3 + egf_ref[3 * 6 + c] * oh_x[c]
                gy2 = gy2 + egf_ref[2 * 6 + c] * oh_y[c]
                gy4 = gy4 + egf_ref[4 * 6 + c] * oh_y[c]

            r = jnp.exp(jnp.clip(ls2 - ls1, -80.0, 80.0))  # (1, B)
            diag = [
                sel_shift(pp, d2, -1, 1) * r for pp in prevprev
            ]
            left = [sel_shift(pv, d1 - 1, -1, 0) for pv in prev]
            up = [sel_shift(pv, d1, 0, 1) for pv in prev]

            def trans_sum(preds, dest):
                acc = tf_ref[0 * 5 + dest] * preds[0]
                for s in range(1, NUM_STATES):
                    acc = acc + tf_ref[s * 5 + dest] * preds[s]
                return acc

            new = [
                e_m * trans_sum(diag, 0),
                gx1 * trans_sum(left, 1),
                gy2 * trans_sum(up, 2),
                gx3 * trans_sum(left, 3),
                gy4 * trans_sum(up, 4),
            ]

            scale = jnp.max(new[0], axis=0, keepdims=True)
            for s in range(1, NUM_STATES):
                scale = jnp.maximum(
                    scale, jnp.max(new[s], axis=0, keepdims=True)
                )
            safe = jnp.where(scale > 0, scale, 1.0)  # (1, B)
            inv = 1.0 / safe
            new = [arr * inv for arr in new]
            ls_new = ls1 + jnp.log(safe)

            # cell (m, n) sits at band index 0 of diagonal k_end
            fin = zb
            for s in range(NUM_STATES):
                fin = fin + jnp.sum(
                    jnp.where(row == 0, new[s], 0.0), axis=0, keepdims=True
                )
            is_end = (k + 1) == kend  # (1, B)
            loglik_ref[:, :] = loglik + jnp.where(
                is_end, jnp.log(jnp.maximum(fin, 1e-37)) + ls_new, 0.0
            )
            for st in range(NUM_STATES):
                state[slot_new, st] = new[st]
            lsbuf[slot_new] = ls_new
            return 0

        return lax.fori_loop(0, CHUNK, step_body, 0)

    lax.fori_loop(0, n_chunks, chunk_body, 0)


def prepare_pallas_forward(
    batch: BandedBatch, params: KernelParams
) -> dict:
    """Host-side repack of a BandedBatch for the Pallas forward kernel."""
    xc = np.asarray(batch.xc)  # (B, K+1, W) int8, sentinel 4
    yc = np.asarray(batch.yc)
    offsets = np.asarray(batch.offsets)
    m = np.asarray(batch.m)
    n = np.asarray(batch.n)
    B, K1, W = xc.shape
    K = K1 - 1
    k_pad = -(-K // CHUNK) * CHUNK  # round up to CHUNK

    # encode lattice/range validity into the codes (sentinel 5)
    ks = np.arange(K1)[None, :, None]
    bs = np.arange(W)[None, None, :]
    j = offsets[:, :, None] + bs
    i = ks - j
    invalid = (
        (j < 0) | (j > n[:, None, None]) | (i < 0) | (i > m[:, None, None])
    )
    x_oor = (j - 1 < 0) | (j - 1 >= n[:, None, None])
    y_oor = (i - 1 < 0) | (i - 1 >= m[:, None, None])
    xv = np.where(invalid | x_oor, 5, xc).astype(np.int8)
    yv = np.where(invalid | y_oor, 5, yc).astype(np.int8)

    xk = np.full((k_pad, W, B), 5, np.int8)
    yk = np.full((k_pad, W, B), 5, np.int8)
    xk[:K] = np.transpose(xv[:, 1:, :], (1, 2, 0))
    yk[:K] = np.transpose(yv[:, 1:, :], (1, 2, 0))

    d1 = np.zeros(k_pad, np.int32)
    d2 = np.zeros(k_pad, np.int32)
    d1[:K] = offsets[0, 1:] - offsets[0, :-1]
    o_km2 = np.concatenate([[0], offsets[0, :-2]])
    d2[:K] = offsets[0, 1:] - o_km2 - 1

    emf = np.zeros(36, np.float32)
    emf[: 30] = np.pad(
        np.asarray(params.e_match_flat).reshape(5, 5), ((0, 0), (0, 1))
    ).reshape(-1)
    egf = np.pad(
        np.asarray(params.e_gap_flat).reshape(5, 5), ((0, 0), (0, 1))
    ).reshape(-1).astype(np.float32)

    # the Pallas path requires a shared band geometry across the batch
    same = bool((offsets == offsets[0]).all())
    return {
        "xk": xk,
        "yk": yk,
        "d1": d1,
        "d2": d2,
        "tf": np.asarray(params.t).reshape(-1).astype(np.float32),
        "emf": emf,
        "egf": egf,
        "kend": (m + n).astype(np.int32).reshape(1, B),
        "k_steps": k_pad,
        "B": B,
        "W": W,
        "uniform_bands": same,
    }


@functools.partial(
    jax.jit, static_argnames=("k_steps", "B", "W", "interpret")
)
def _pallas_forward_call(
    d1, d2, tf, emf, egf, kend, xk, yk, k_steps, B, W, interpret=False
):
    kernel = functools.partial(_kernel, k_steps=k_steps, B=B, W=W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kend
            pl.BlockSpec(memory_space=pltpu.ANY),  # xc (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),  # yc (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, W, B), jnp.int8),
            pltpu.VMEM((2, CHUNK, W, B), jnp.int8),
            pltpu.VMEM((2, NUM_STATES, W, B), jnp.float32),
            pltpu.VMEM((2, 1, B), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        interpret=interpret,
    )(d1, d2, tf, emf, egf, kend, xk, yk)


def pallas_forward_loglik(
    batch: BandedBatch, params: KernelParams, interpret: bool = False
) -> jax.Array:
    """Forward log-likelihood via the fused Pallas kernel.

    Requires uniform band geometry across the batch (see
    prepare_pallas_forward); raises otherwise.
    """
    prep = prepare_pallas_forward(batch, params)
    if not prep["uniform_bands"]:
        raise ValueError(
            "pallas forward requires identical band offsets across the "
            "batch; use ops.pairhmm.forward_loglik"
        )
    out = _pallas_forward_call(
        jnp.asarray(prep["d1"]),
        jnp.asarray(prep["d2"]),
        jnp.asarray(prep["tf"]),
        jnp.asarray(prep["emf"]),
        jnp.asarray(prep["egf"]),
        jnp.asarray(prep["kend"]),
        jnp.asarray(prep["xk"]),
        jnp.asarray(prep["yk"]),
        prep["k_steps"],
        prep["B"],
        prep["W"],
        interpret,
    )
    return out[0, :]
