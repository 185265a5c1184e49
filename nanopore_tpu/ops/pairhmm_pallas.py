"""Pallas forward-only kernel for the banded pair-HMM (EXPERIMENTAL).

STATUS: stepping-stone / test harness, NOT a production path.  The
production kernel is ops/pairhmm_pallas_realign.py (fused forward +
backward/EM + reverse-MEA), which production code reaches through
ops/dispatch.py; the only production imports from this module are the
``_unpack_onehots``/``_unpack_onehots32`` helpers it shares.  This file
is kept as the minimal forward-only harness the hardware findings below
were established on (tests/test_pallas.py pins its parity).

The XLA-scan kernel (ops/pairhmm.py) is latency-bound: each anti-diagonal
is one while-loop step (~4.5us dispatch) while the actual VPU work per
step is well under 1us.  This kernel runs the whole diagonal loop inside
one Pallas program so the only per-step costs are VPU ops and VMEM
traffic.

Round-3 design — informed by the scripts_dev/pallas_ladder3.py hardware
measurements (v5e):
- a fori_loop over diagonal PAIRS inside a single kernel program costs
  ~292 ns per pair for the full real body (vs ~1.6 ms per grid step for
  the round-2 grid-streamed version: the Mosaic grid pipeline, not the
  body, was the bottleneck);
- band code chunks stream HBM->VMEM via MANUAL double-buffered
  make_async_copy DMAs (2 x CHUNK diagonals in flight), overlapping the
  copy of chunk c+1 with the compute of chunk c;
- the batch is tiled into (W, BT=128) programs over a 1-D grid; each
  program runs the entire diagonal loop for its tile, so scratch init /
  output emit are straight-line code (no cross-step @pl.when state);
- traced leading-index READS of the flattened VMEM code buffer are fast
  (ladder3: buf[t] with traced t measured at full speed); traced scratch
  WRITES remain static (ping-pong sA/sB buffers, unroll by 2).

Mosaic-friendly construction kept from rounds 1-2:
- x and y codes PACKED into one int8 (x*8+y): half the HBM traffic,
  unpacked in-kernel with shift/mask;
- no dot_general: emissions and transition sums are unrolled
  scalar-times-vector FMAs over SMEM table entries;
- no scatter / jnp.pad: masks via broadcasted_iota, band shifts via
  pltpu.roll (shift >= 0) + edge masking;
- rescaling every SECOND diagonal only, the skipped step's scale ratio
  carried directly as 1/safe — zero exp() calls, one log() per two
  diagonals.

Validity is encoded in the codes themselves: out-of-lattice cells carry
code 5, whose one-hot is zero, so every arrival emission vanishes — no
separate mask pass.  (Rogue delete/insert mass outside the lattice can
never re-enter it: i and j are non-decreasing along forward moves.)

Forward-only (log-likelihood); the backward/EM path stays on the XLA
kernel (see pairhmm_pallas_realign for the fused realign kernel).
Requires uniform band geometry across the batch.  Oracle-tested against
ops/pairhmm in interpret mode (tests/test_pallas.py).
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
CHUNK = 256  # diagonals per DMA chunk (must be even)
BT = 128  # batch-tile width (lanes)


def _unpack_onehots32(xy32):
    """int32 packed codes (x*8+y) -> per-code one-hot (W, BT) f32 lists.

    Bits 6/7 may carry per-read band-delta flags (pairhmm_pallas_realign)
    and int8->int32 sign-extends bit 7, so both x and y extractions mask
    to 3 bits.
    """
    xv = (xy32 >> 3) & 7
    yv = xy32 & 7
    oh_x = [(xv == v).astype(jnp.float32) for v in range(5)]
    oh_y = [(yv == v).astype(jnp.float32) for v in range(5)]
    return oh_x, oh_y


def _unpack_onehots(xy):
    """Packed int8 codes (x*8+y) -> per-code one-hot (W, BT) f32 lists."""
    return _unpack_onehots32(xy.astype(jnp.int32))


def _kernel(
    # scalar-prefetch (SMEM)
    d1_ref,  # (K_pad,) int32 band offset deltas o[k+1]-o[k]
    d2_ref,  # (K_pad,) int32 o[k+1]-o[k-1]-1
    tf_ref,  # (25,) f32 transitions [from*5+to]
    emf_ref,  # (36,) f32 match emissions [x*6+y], rows/cols 5 zero
    egf_ref,  # (30,) f32 gap emissions [state*6+base], col 5 zero
    # tensor inputs
    kend_ref,  # (1, BT) int32 VMEM block (per batch tile)
    xy_hbm,  # (NB, K_pad, W, BT) int8 in HBM: packed codes x*8+y
    # outputs
    loglik_ref,  # (1, BT) f32
    # scratch
    buf,  # (2 * CHUNK, W, BT) int8 double-buffered code chunks
    sA,  # (NUM_STATES, W, BT) f32 even-diagonal state
    sB,  # (NUM_STATES, W, BT) f32 odd-diagonal state
    ls_ref,  # (1, BT) f32 log-scale of sA
    rs_ref,  # (1, BT) f32: exp(ls_B - ls_A) = 1/safe of the last rescale
    acc_ref,  # (1, BT) f32 running log-likelihood
    sems,  # (2,) DMA semaphores
    *,
    k_pad: int,
    W: int,
):
    bt = pl.program_id(0)
    n_chunks = k_pad // CHUNK
    pairs_per_chunk = CHUNK // 2

    row = lax.broadcasted_iota(jnp.int32, (W, BT), 0)
    zeros = jnp.zeros((W, BT), jnp.float32)
    zb = jnp.zeros((1, BT), jnp.float32)
    kend = kend_ref[:, :]  # (1, BT)

    # ---- per-program init (straight-line: one program = one tile) ----
    start_val = jnp.where(row == 0, 1.0 / NUM_STATES, 0.0)
    for st in range(NUM_STATES):
        sA[st] = start_val  # diagonal 0
        sB[st] = zeros  # "diagonal -1"
    ls_ref[:, :] = zb
    rs_ref[:, :] = jnp.ones((1, BT), jnp.float32)
    acc_ref[:, :] = zb

    def chunk_dma(c, slot):
        return pltpu.make_async_copy(
            xy_hbm.at[bt, pl.ds(c * CHUNK, CHUNK)],
            buf.at[pl.ds(slot * CHUNK, CHUNK)],
            sems.at[slot],
        )

    chunk_dma(0, 0).start()

    def shift_w(arr, s: int):
        """result[w, :] = arr[w+s, :] with zero fill (roll needs s>=0)."""
        if s == 0:
            return arr
        rolled = pltpu.roll(arr, (-s) % W, 0)
        if s > 0:
            return jnp.where(row < W - s, rolled, 0.0)
        return jnp.where(row >= -s, rolled, 0.0)

    def sel_shift(arr, s, lo, hi):
        out = shift_w(arr, lo)
        for v in range(lo + 1, hi + 1):
            out = jnp.where(s == v, shift_w(arr, v), out)
        return out

    def diag_step(k_new, xy, prev, prevprev, r, ls_cur, acc, rescale):
        """One anti-diagonal.

        k_new: traced diagonal index being computed.
        prev/prevprev: lists of 5 (W, BT) tiles; r: (1, BT) scale ratio
        putting prevprev on prev's scale; ls_cur: (1, BT) log-scale of
        prev.  Returns (new_state(list), ls_new, safe_inv, acc).
        """
        d1 = d1_ref[k_new - 1]
        d2 = d2_ref[k_new - 1]
        oh_x, oh_y = _unpack_onehots(xy)

        # emissions: unrolled scalar-FMA over SMEM tables
        e_m = zeros
        for a in range(5):
            inner = zeros
            for cc in range(5):
                inner = inner + emf_ref[a * 6 + cc] * oh_y[cc]
            e_m = e_m + oh_x[a] * inner
        gx1 = zeros
        gx3 = zeros
        gy2 = zeros
        gy4 = zeros
        for cc in range(5):
            gx1 = gx1 + egf_ref[1 * 6 + cc] * oh_x[cc]
            gx3 = gx3 + egf_ref[3 * 6 + cc] * oh_x[cc]
            gy2 = gy2 + egf_ref[2 * 6 + cc] * oh_y[cc]
            gy4 = gy4 + egf_ref[4 * 6 + cc] * oh_y[cc]

        def trans_sum(preds, dest):
            acc_t = tf_ref[0 * 5 + dest] * preds[0]
            for s in range(1, NUM_STATES):
                acc_t = acc_t + tf_ref[s * 5 + dest] * preds[s]
            return acc_t

        # transitions summed BEFORE the band shifts (5 shifted tiles
        # instead of 15 — shifts are linear selections, so they commute
        # with the source-state contraction; scripts_dev ladder6: -26%)
        new = [
            e_m * (sel_shift(trans_sum(prevprev, 0), d2, -1, 1) * r),
            gx1 * sel_shift(trans_sum(prev, 1), d1 - 1, -1, 0),
            gy2 * sel_shift(trans_sum(prev, 2), d1, 0, 1),
            gx3 * sel_shift(trans_sum(prev, 3), d1 - 1, -1, 0),
            gy4 * sel_shift(trans_sum(prev, 4), d1, 0, 1),
        ]

        if rescale:
            scale = jnp.max(new[0], axis=0, keepdims=True)
            for s in range(1, NUM_STATES):
                scale = jnp.maximum(
                    scale, jnp.max(new[s], axis=0, keepdims=True)
                )
            safe = jnp.where(scale > 0, scale, 1.0)
            inv = 1.0 / safe
            new = [arr * inv for arr in new]
            ls_new = ls_cur + jnp.log(safe)
            safe_inv = inv
        else:
            ls_new = ls_cur
            safe_inv = None

        # cell (m, n) sits at band index 0 of diagonal k_end
        fin = zb
        for s in range(NUM_STATES):
            fin = fin + new[s][0:1, :]
        acc = acc + jnp.where(
            k_new == kend, jnp.log(jnp.maximum(fin, 1e-37)) + ls_new, 0.0
        )
        return new, ls_new, safe_inv, acc

    def chunk_body(c, _):
        slot = lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_dma(c + 1, 1 - slot).start()

        chunk_dma(c, slot).wait()
        base = slot * CHUNK

        def pair_body(ip, _):
            # global diagonal pair: computes diagonals k0+1 (odd), k0+2
            k0 = (c * pairs_per_chunk + ip) * 2
            t = base + ip * 2
            a = [sA[st] for st in range(NUM_STATES)]
            b = [sB[st] for st in range(NUM_STATES)]
            ls_a = ls_ref[:, :]
            rs = rs_ref[:, :]
            acc = acc_ref[:, :]

            # step 1: odd diagonal; prev=sA (scale ls_a), prevprev=sB
            # whose scale is the pre-rescale ls_a: r = 1/safe from rs
            new_b, ls_b, _, acc = diag_step(
                k0 + 1, buf[t], a, b, rs, ls_a, acc, rescale=False
            )
            # step 2: even diagonal; prev=sB (scale ls_b==ls_a),
            # prevprev=sA (same scale): r = 1.  Rescale here.
            one = jnp.ones((1, BT), jnp.float32)
            new_a, ls_a2, inv, acc = diag_step(
                k0 + 2, buf[t + 1], new_b, a, one, ls_b, acc,
                rescale=True,
            )
            # sB keeps pre-rescale scale ls_b = old ls_a; sA now ls_a2;
            # next pair's prevprev ratio r = exp(ls_b - ls_a2) = inv
            for st in range(NUM_STATES):
                sB[st] = new_b[st]
                sA[st] = new_a[st]
            ls_ref[:, :] = ls_a2
            rs_ref[:, :] = inv
            acc_ref[:, :] = acc
            return 0

        lax.fori_loop(0, pairs_per_chunk, pair_body, 0)
        return 0

    lax.fori_loop(0, n_chunks, chunk_body, 0)
    loglik_ref[:, :] = acc_ref[:, :]


def prepare_pallas_forward(
    batch: BandedBatch, params: KernelParams
) -> dict:
    """Host-side repack of a BandedBatch for the Pallas forward kernel.

    Pads the batch to a multiple of BT lanes and tiles it as
    (NB, K_pad, W, BT) so each grid program streams one contiguous tile.
    """
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

    # pack x/y into one int8 stream: x*8+y (codes 0..5 each)
    B_pad = -(-B // BT) * BT
    NB = B_pad // BT
    xyk = np.full((k_pad, W, B_pad), (5 << 3) | 5, np.int8)
    xyk[:K, :, :B] = np.transpose(
        (xv[:, 1:, :].astype(np.int16) << 3) | yv[:, 1:, :], (1, 2, 0)
    ).astype(np.int8)
    # (k_pad, W, B_pad) -> (NB, k_pad, W, BT)
    xyk = np.ascontiguousarray(
        xyk.reshape(k_pad, W, NB, BT).transpose(2, 0, 1, 3)
    )

    d1 = np.zeros(k_pad, np.int32)
    d2 = np.zeros(k_pad, np.int32)
    d1[:K] = offsets[0, 1:] - offsets[0, :-1]
    o_km2 = np.concatenate([[0], offsets[0, :-2]])
    d2[:K] = offsets[0, 1:] - o_km2 - 1

    emf = np.zeros(36, np.float32)
    emf[:30] = np.pad(
        np.asarray(params.e_match_flat).reshape(5, 5), ((0, 0), (0, 1))
    ).reshape(-1)
    egf = np.pad(
        np.asarray(params.e_gap_flat).reshape(5, 5), ((0, 0), (0, 1))
    ).reshape(-1).astype(np.float32)

    kend = np.full(B_pad, -1, np.int32)  # pad lanes never finalise
    kend[:B] = (m + n).astype(np.int32)

    # the Pallas path requires a shared band geometry across the batch
    same = bool((offsets == offsets[0]).all())
    return {
        "xyk": xyk,
        "d1": d1,
        "d2": d2,
        "tf": np.asarray(params.t).reshape(-1).astype(np.float32),
        "emf": emf,
        "egf": egf,
        "kend": kend.reshape(NB, 1, BT),
        "k_steps": k_pad,
        "B": B,
        "NB": NB,
        "W": W,
        "uniform_bands": same,
    }


@functools.partial(
    jax.jit, static_argnames=("k_steps", "NB", "W", "interpret")
)
def _pallas_forward_call(
    d1, d2, tf, emf, egf, kend, xyk, k_steps, NB, W, interpret=False
):
    kernel = functools.partial(_kernel, k_pad=k_steps, W=W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(NB,),
        in_specs=[
            # kend: one (1, BT) block per batch tile
            pl.BlockSpec(
                (None, 1, BT), lambda bt, *_: (bt, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # packed band codes stay in HBM; the kernel DMAs chunks
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (None, 1, BT), lambda bt, *_: (bt, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * CHUNK, W, BT), jnp.int8),  # buf
            pltpu.VMEM((NUM_STATES, W, BT), jnp.float32),  # sA
            pltpu.VMEM((NUM_STATES, W, BT), jnp.float32),  # sB
            pltpu.VMEM((1, BT), jnp.float32),  # ls
            pltpu.VMEM((1, BT), jnp.float32),  # rs
            pltpu.VMEM((1, BT), jnp.float32),  # acc
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB, 1, BT), jnp.float32),
        interpret=interpret,
    )(d1, d2, tf, emf, egf, kend, xyk)
    return out.reshape(NB * BT)


class PallasForwardPlan:
    """Device-resident inputs for the Pallas forward kernel.

    The host repack (prepare_pallas_forward) costs seconds for large
    batches — build the plan ONCE per batch and call run() repeatedly;
    run() is a single jitted pallas_call.
    """

    def __init__(self, batch: BandedBatch, params: KernelParams):
        prep = prepare_pallas_forward(batch, params)
        if not prep["uniform_bands"]:
            raise ValueError(
                "pallas forward requires identical band offsets across "
                "the batch; use ops.pairhmm.forward_loglik"
            )
        self.arrays = tuple(
            jnp.asarray(prep[k])
            for k in ("d1", "d2", "tf", "emf", "egf", "kend", "xyk")
        )
        self.k_steps = prep["k_steps"]
        self.B = prep["B"]
        self.NB = prep["NB"]
        self.W = prep["W"]

    def run(self, interpret: bool = False) -> jax.Array:
        out = _pallas_forward_call(
            *self.arrays, self.k_steps, self.NB, self.W, interpret
        )
        return out[: self.B]


def pallas_forward_loglik(
    batch: BandedBatch, params: KernelParams, interpret: bool = False
) -> jax.Array:
    """Forward log-likelihood via the fused Pallas kernel.

    Requires uniform band geometry across the batch (see
    prepare_pallas_forward); raises otherwise.  Prefer PallasForwardPlan
    when calling repeatedly on one batch.
    """
    return PallasForwardPlan(batch, params).run(interpret)
