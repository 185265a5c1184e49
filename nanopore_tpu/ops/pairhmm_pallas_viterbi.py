"""Pallas banded Viterbi kernel: single-pass max-product decode.

The forward-only max-product path for the mapping engine's extension
stage
(``MapperConfig.decode = "viterbi"``): max-product twin of the fused
realign kernel's phase A, in LOG space (no per-diagonal rescaling —
magnitudes stay within f32), emitting packed per-state backpointers per
diagonal.  One pass over the lattice instead of realign's three
(forward + remat + backward), no EM accumulators, no MEA — the
semantics of the reference's non-probabilistic aligner extension DP
(bwa/lastal/lastz/blasr sparse DP, reference ``nanopore/mappers/*.py``)
— the forward pass at ~1.5x the fused kernel's cells/s (the FULL
decode including the backpointer walk measures slower than the MEA
decode path; VITERBI_HW.json).

Shares the host pack with the realign kernel
(ops.pairhmm_pallas_realign.prepare_pallas_realign): the packed
``xyc`` code stream carries x/y codes and the per-read Lipschitz-1
band deltas in bits 6/7; only the scalar tables differ (log-space
transition/emission tables).  Sentinel codes (out-of-lattice cells)
zero the one-hots, which here maps to a NEG log-emission (explicit
per-state validity selects — log space has no zero-mass trick).

Backpointers: per cell, the argmax predecessor STATE of each of the 5
states, packed into ONE int8 plane per diagonal.  The fiveState
transition STRUCTURE (each gap state is entered only from match or
itself — the canonical cactus model, align.model structure zeros)
means only the match state needs a full 5-way predecessor; each gap
state needs a single from-match/from-self bit:

    p = bM + 5 * (tD1 + 2 tI1 + 4 tD2 + 8 tI2)   in [0, 80)

Round 4 streamed TWO base-5 planes (p0 = bM + 5 bD1 + 25 bI1,
p1 = bD2 + 5 bI2); halving the stream halves both this kernel's HBM
write side and the walker's read side, and drops one of the walker's
two per-diagonal (W, BT) one-hot contractions (VERDICT r4 #5).
``viterbi_structure_ok`` guards the assumption; models outside the
structure take the XLA path.  Backpointers are DMA'd out in
SEG-diagonal blocks like the realign kernel's direction codes; the
traceback is a batched on-device scan over descending diagonals
(viterbi_traceback_batch) — the plane never crosses to the host.

Oracle: ops.viterbi._viterbi_scan_single (XLA), itself pinned to the
pair-HMM semantics of ops/pairhmm_ref.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanopore_tpu.io.sam import CIG
from nanopore_tpu.ops.pairhmm import BandedBatch, KernelParams
from nanopore_tpu.ops.pairhmm_pallas import _unpack_onehots32
from nanopore_tpu.ops.pairhmm_pallas_realign import (
    BT,
    prepare_pallas_realign,
)

NUM_STATES = 5
CHUNK = 128  # diagonals per input DMA chunk
SEG = 16  # diagonals per backpointer output block
NEG = -1e30


def _viterbi_kernel(
    # scalar-prefetch (SMEM): LOG-space tables
    ltf_ref,  # (25,) f32 log transitions [from*5+to]
    lemf_ref,  # (36,) f32 log match emissions [x*6+y]
    legf_ref,  # (30,) f32 log gap emissions [state*6+base]
    # tensor inputs
    kend_ref,  # (1, BT) int32 VMEM
    xyc_hbm,  # (NB, K_pad, W, BT) int8 packed codes (+ delta bits 6/7)
    # outputs
    score_ref,  # (1, BT) f32
    fstate_ref,  # (1, BT) f32 (argmax state at k_end, cast on host)
    bp_hbm,  # (NB*k1_rows, W, BT) int8: ONE packed plane per diagonal
    # scratch
    bufA,  # (2*CHUNK, W, BT) int8
    vA,  # (5, W, BT) f32 even-diagonal state (log)
    vB,  # (5, W, BT) f32 odd-diagonal state (log)
    bp_buf,  # (2*SEG, W, BT) int8 staged backpointer planes
    in_sems,  # DMA (2,)
    out_sems,  # DMA (2,)
    *,
    k_pad: int,
    k1_rows: int,  # per-tile bp row stride: k_pad+1 rounded up to the
    #               walker's 128-diagonal chunk, so the traceback
    #               consumes bp_raw with NO pad-copy (rows past the
    #               lattice are never written; the walk is inactive
    #               there by the i+j == k predicate)
    W: int,
):
    bt = pl.program_id(0)
    n_chunks = k_pad // CHUNK
    segs_per_chunk = CHUNK // SEG

    row = lax.broadcasted_iota(jnp.int32, (W, BT), 0)
    zeros = jnp.zeros((W, BT), jnp.float32)
    neg_tile = jnp.full((W, BT), NEG, jnp.float32)
    kend = kend_ref[:, :]

    def shift_w(arr, s: int, fill):
        if s == 0:
            return arr
        rolled = pltpu.roll(arr, (-s) % W, 0)
        if s > 0:
            return jnp.where(row < W - s, rolled, fill)
        return jnp.where(row >= -s, rolled, fill)

    def lane_shift(arr, d, lo, hi, fill):
        out = None
        for v in range(lo, hi + 1):
            mv = (d == v).astype(jnp.float32)
            sv = shift_w(arr, v, fill)
            out = mv * sv if out is None else out + mv * sv
        return out

    def best(preds, dest):
        """Max/argmax over predecessor states for one destination."""
        v = preds[0] + ltf_ref[0 * 5 + dest]
        bf = zeros
        for s in range(1, NUM_STATES):
            c = preds[s] + ltf_ref[s * 5 + dest]
            take = c > v
            v = jnp.maximum(v, c)
            bf = jnp.where(take, jnp.float32(s), bf)
        return v, bf

    def diag_step(k_new, xy, prev, prevprev, score, fstate):
        xy32 = xy.astype(jnp.int32)
        d1 = (xy32 >> 6) & 1
        d1p = (xy32 >> 7) & 1
        d2 = d1 + d1p - 1
        oh_x, oh_y = _unpack_onehots32(xy32)

        # log emissions by one-hot contraction; sentinel codes zero the
        # one-hots -> explicit NEG selects (no zero-mass trick in log)
        le_m = zeros
        vx = zeros
        vy = zeros
        for a in range(5):
            inner = zeros
            for cc in range(5):
                inner = inner + lemf_ref[a * 6 + cc] * oh_y[cc]
            le_m = le_m + oh_x[a] * inner
            vx = vx + oh_x[a]
            vy = vy + oh_y[a]
        lgx1 = zeros
        lgx3 = zeros
        lgy2 = zeros
        lgy4 = zeros
        for cc in range(5):
            lgx1 = lgx1 + legf_ref[1 * 6 + cc] * oh_x[cc]
            lgx3 = lgx3 + legf_ref[3 * 6 + cc] * oh_x[cc]
            lgy2 = lgy2 + legf_ref[2 * 6 + cc] * oh_y[cc]
            lgy4 = lgy4 + legf_ref[4 * 6 + cc] * oh_y[cc]
        ok_xy = vx * vy
        ok_x = vx
        ok_y = vy
        le_m = jnp.where(ok_xy > 0, le_m, NEG)
        lgx1 = jnp.where(ok_x > 0, lgx1, NEG)
        lgx3 = jnp.where(ok_x > 0, lgx3, NEG)
        lgy2 = jnp.where(ok_y > 0, lgy2, NEG)
        lgy4 = jnp.where(ok_y > 0, lgy4, NEG)

        # max/argmax BEFORE the band shifts (max commutes with the
        # per-lane shifts exactly as the linear kernel's tsum-first)
        vM, bM = best(prevprev, 0)
        vD1, bD1 = best(prev, 1)
        vI1, bI1 = best(prev, 2)
        vD2, bD2 = best(prev, 3)
        vI2, bI2 = best(prev, 4)

        vM = lane_shift(vM, d2, -1, 1, NEG)
        bM = lane_shift(bM, d2, -1, 1, 0.0)
        vD1 = lane_shift(vD1, d1 - 1, -1, 0, NEG)
        bD1 = lane_shift(bD1, d1 - 1, -1, 0, 0.0)
        vD2 = lane_shift(vD2, d1 - 1, -1, 0, NEG)
        bD2 = lane_shift(bD2, d1 - 1, -1, 0, 0.0)
        vI1 = lane_shift(vI1, d1, 0, 1, NEG)
        bI1 = lane_shift(bI1, d1, 0, 1, 0.0)
        vI2 = lane_shift(vI2, d1, 0, 1, NEG)
        bI2 = lane_shift(bI2, d1, 0, 1, 0.0)

        new = [
            vM + le_m,
            vD1 + lgx1,
            vI1 + lgy2,
            vD2 + lgx3,
            vI2 + lgy4,
        ]
        # NEG + NEG overflows past -inf representability concerns: clamp
        new = [jnp.maximum(x, NEG) for x in new]

        # single-plane pack: gap-state bps collapse to from-self bits
        # (structure-guarded at plan build; degenerate all-NEG cells
        # may carry arbitrary argmaxes but are never on the path)
        tD1 = jnp.where(bD1 != 0.0, 1.0, 0.0)
        tI1 = jnp.where(bI1 != 0.0, 1.0, 0.0)
        tD2 = jnp.where(bD2 != 0.0, 1.0, 0.0)
        tI2 = jnp.where(bI2 != 0.0, 1.0, 0.0)
        p = (
            bM + 5.0 * (tD1 + 2.0 * tI1 + 4.0 * tD2 + 8.0 * tI2)
        ).astype(jnp.int8)

        # end capture at each lane's k_end: score/state of band cell 0
        is_end = k_new == kend  # (1, BT)
        v_end = new[0][0:1, :]
        s_end = jnp.zeros((1, BT), jnp.float32)
        for s in range(1, NUM_STATES):
            take = new[s][0:1, :] > v_end
            v_end = jnp.maximum(v_end, new[s][0:1, :])
            s_end = jnp.where(take, jnp.float32(s), s_end)
        score = jnp.where(is_end, v_end, score)
        fstate = jnp.where(is_end, s_end, fstate)
        return new, score, fstate, p

    # init: diagonal 0 state (band cell 0 = lattice origin)
    start = jnp.where(row == 0, np.float32(np.log(1.0 / NUM_STATES)), NEG)
    for st in range(NUM_STATES):
        vA[st] = start
        vB[st] = neg_tile

    def chunk_dma(c, slot):
        return pltpu.make_async_copy(
            xyc_hbm.at[bt, pl.ds(c * CHUNK, CHUNK)],
            bufA.at[pl.ds(slot * CHUNK, CHUNK)],
            in_sems.at[slot],
        )

    chunk_dma(0, 0).start()
    score0 = jnp.full((1, BT), NEG, jnp.float32)
    fstate0 = jnp.zeros((1, BT), jnp.float32)
    score_ref[:, :] = score0
    fstate_ref[:, :] = fstate0

    def chunk_body(c, _):
        slot = lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_dma(c + 1, 1 - slot).start()

        chunk_dma(c, slot).wait()
        base = slot * CHUNK

        def seg_body(sl, _):
            sg = c * segs_per_chunk + sl  # global SEG index
            bslot = lax.rem(sg, 2)

            # wait for the bp DMA that used this staging slot last
            @pl.when(sg >= 2)
            def _():
                pltpu.make_async_copy(
                    bp_buf.at[pl.ds(bslot * SEG, SEG)],
                    bp_hbm.at[pl.ds(bt * k1_rows + 1, SEG)],
                    out_sems.at[bslot],
                ).wait()

            def pair_body(ip, _):
                t = base + sl * SEG + 2 * ip
                kl = sl * SEG + 2 * ip  # chunk-local diagonal index
                k0 = c * CHUNK + kl
                a = [vA[st] for st in range(NUM_STATES)]
                b = [vB[st] for st in range(NUM_STATES)]
                nb, sc, fs, pb = diag_step(
                    k0 + 1, bufA[t], a, b, score_ref[:, :],
                    fstate_ref[:, :],
                )
                na, sc, fs, pa = diag_step(
                    k0 + 2, bufA[t + 1], nb, a, sc, fs
                )
                for st in range(NUM_STATES):
                    vB[st] = nb[st]
                    vA[st] = na[st]
                score_ref[:, :] = sc
                fstate_ref[:, :] = fs

                # stage the two diagonals' planes (static indices under
                # slot predicates — traced int8 stores miscompile, see
                # the realign kernel's dirs_buf note)
                @pl.when(bslot == 0)
                def _s0(pb=pb, pa=pa, ip=ip):
                    bp_buf[2 * ip] = pb
                    bp_buf[2 * ip + 1] = pa

                @pl.when(bslot == 1)
                def _s1(pb=pb, pa=pa, ip=ip):
                    bp_buf[SEG + 2 * ip] = pb
                    bp_buf[SEG + 2 * ip + 1] = pa

                return 0

            lax.fori_loop(0, SEG // 2, pair_body, 0)

            base_row = bt * k1_rows + 1 + sg * SEG
            pltpu.make_async_copy(
                bp_buf.at[pl.ds(bslot * SEG, SEG)],
                bp_hbm.at[pl.ds(base_row, SEG)],
                out_sems.at[bslot],
            ).start()
            return 0

        lax.fori_loop(0, segs_per_chunk, seg_body, 0)
        return 0

    lax.fori_loop(0, n_chunks, chunk_body, 0)

    total_segs = k_pad // SEG
    for bslot in range(min(2, total_segs)):
        pltpu.make_async_copy(
            bp_buf.at[pl.ds(bslot * SEG, SEG)],
            bp_hbm.at[pl.ds(bt * k1_rows + 1, SEG)],
            out_sems.at[bslot],
        ).wait()


def _log_tables(params: KernelParams):
    from nanopore_tpu.ops.pairhmm_pallas_realign import _param_scalars

    tf, emf, egf = _param_scalars(params)
    floor = 1e-37
    return (
        # structure zeros must be NEG, not log(floor) ~ -85: a floored
        # "transition" could otherwise win an argmax from a much better
        # predecessor and put a structurally-impossible state in the
        # backpointer plane (the single-plane pack assumes gap states
        # are entered from match or self only)
        np.where(
            tf > 0, np.log(np.maximum(tf, floor)), NEG
        ).astype(np.float32),
        np.log(np.maximum(emf, floor)).astype(np.float32),
        np.log(np.maximum(egf, floor)).astype(np.float32),
    )


@functools.partial(
    jax.jit, static_argnames=("k_pad", "NB", "W", "interpret")
)
def _pallas_viterbi_call(
    ltf, lemf, legf, kend, xyc, k_pad, NB, W, interpret=False
):
    k1_rows = -(-(k_pad + 1) // 128) * 128
    kernel = functools.partial(
        _viterbi_kernel, k_pad=k_pad, k1_rows=k1_rows, W=W
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(
                (None, 1, BT), lambda b, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (None, 1, BT), lambda b, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 1, BT), lambda b, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # bp planes
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * CHUNK, W, BT), jnp.int8),  # bufA
            pltpu.VMEM((5, W, BT), jnp.float32),  # vA
            pltpu.VMEM((5, W, BT), jnp.float32),  # vB
            pltpu.VMEM((2 * SEG, W, BT), jnp.int8),  # bp_buf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((NB, 1, BT), jnp.float32),  # score
        jax.ShapeDtypeStruct((NB, 1, BT), jnp.float32),  # fstate
        jax.ShapeDtypeStruct((NB * k1_rows, W, BT), jnp.int8),
    ]
    score, fstate, bp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ltf, lemf, legf, kend, xyc)

    def lanes(x):
        return jnp.transpose(x, (0, 2, 1)).reshape(x.shape[0] * BT, -1)

    return {
        "score": lanes(score)[:, 0],
        "fstate": lanes(fstate)[:, 0].astype(jnp.int32),
        # native k-major layout (NB, K1, W, BT); the on-device
        # traceback consumes it directly — transposing the full plane
        # tensor to per-read bands costs ~seconds of byte-shuffle at
        # production batch sizes
        "bp_raw": bp.reshape(NB, k1_rows, W, BT),
    }


# memoized per transition table: the answer is a property of the model,
# and np.asarray on a remote device array is a blocking ~23 ms pull —
# without the cache every prepared batch paid it twice.  Entries hold a
# strong ref to the table so its id cannot be recycled; the cache is
# bounded (mapping runs use a handful of models).
_STRUCTURE_OK_CACHE: dict[int, tuple[object, bool]] = {}


def viterbi_structure_ok(params: KernelParams) -> bool:
    """True when the transition structure admits the single-plane
    backpointer pack: every gap state is entered only from match or
    itself (the canonical fiveState structure).  Models outside it
    must take the XLA Viterbi path."""
    key = id(params.t)
    hit = _STRUCTURE_OK_CACHE.get(key)
    if hit is not None and hit[0] is params.t:
        return hit[1]
    t = np.asarray(params.t, np.float64)
    ok = True
    for dest in range(1, NUM_STATES):
        for src in range(NUM_STATES):
            if src not in (0, dest) and t[src, dest] > 0:
                ok = False
    if len(_STRUCTURE_OK_CACHE) >= 64:
        _STRUCTURE_OK_CACHE.clear()
    _STRUCTURE_OK_CACHE[key] = (params.t, ok)
    return ok


class PallasViterbiPlan:
    """Device-resident inputs for the Viterbi kernel (cf.
    PallasRealignPlan — same packed code stream, log-space tables)."""

    def __init__(self, batch: BandedBatch | None, params: KernelParams,
                 device=None, prep: dict | None = None):
        if not viterbi_structure_ok(params):
            raise ValueError(
                "model transition structure outside the canonical "
                "fiveState form (gap states entered from match/self "
                "only): the packed backpointer plane cannot represent "
                "it — use the XLA Viterbi path"
            )
        if prep is None:
            prep = prepare_pallas_realign(batch, params)
        self.device = device
        put = (
            jnp.asarray
            if device is None
            else (lambda a: jax.device_put(a, device))
        )
        ltf, lemf, legf = _log_tables(params)
        self.arrays = (
            put(ltf), put(lemf), put(legf),
            put(prep["kend"]), put(prep["xyc"]),
        )
        self.k_pad = prep["k_pad"]
        self.B = prep["B"]
        self.K = prep["K"]
        self.NB = prep["NB"]
        self.W = prep["W"]

    def run(self, interpret: bool = False) -> dict:
        out = _pallas_viterbi_call(
            *self.arrays, self.k_pad, self.NB, self.W, interpret
        )
        B = self.B
        return {
            "score": out["score"][:B],
            "fstate": out["fstate"][:B],
            "bp_raw": out["bp_raw"],
        }


def pallas_viterbi(
    batch: BandedBatch,
    params: KernelParams,
    interpret: bool = False,
) -> dict:
    """Single-pass banded Viterbi on the Pallas kernel.

    Returns {score (B,), fstate (B,), bp_raw (NB, K+1, W, BT) int8
    packed plane}; decode with viterbi_traceback_batch (on device).
    """
    return PallasViterbiPlan(batch, params).run(interpret)


# --------------------------------------------------------------------- #
# On-device batched traceback over the packed planes
# --------------------------------------------------------------------- #
OP_M, OP_D, OP_I, OP_NONE = 0, 1, 2, 3
_OP_TO_CIG = {OP_M: CIG.M, OP_D: CIG.D, OP_I: CIG.I}


@jax.jit
def _viterbi_ops_raw_jit(bp_raw, offs_t, m, n, fstate):
    """Walk the Viterbi path backward over descending diagonals,
    consuming the kernel's native k-major plane layout
    (NB, K1, W, BT) — no per-read band transpose.

    offs_t (K1, NB, BT) int32, m/n/fstate (NB, BT).  Returns
    ((fi, fj), ops (K1, NB, BT) int8) where column k holds the move
    taken INTO diagonal k's path cell (OP_NONE off-path).  Band reads
    are one-hot contractions (no gathers).
    """
    from nanopore_tpu.ops.pairhmm import SCAN_UNROLL

    NB, K1, W, BT = bp_raw.shape
    # materialise before the scan (see _traceback_ops_raw_jit): fused
    # per-step transpose+reverse gathers cost ~seconds at B=1024
    bp_t = lax.optimization_barrier(
        jnp.transpose(bp_raw, (1, 0, 2, 3))[::-1]
    )  # (K1 desc, NB, W, BT)
    lanes = jnp.arange(W, dtype=jnp.int32)[None, :, None]
    m = m.astype(jnp.int32)
    n = n.astype(jnp.int32)

    def step(carry, xs):
        i, j, s = carry
        bp_k, off_k, k = xs
        active = (i + j) == k
        at_origin = (i == 0) & (j == 0)
        act = active & ~at_origin
        b = j - off_k
        oh = lanes == b[:, None, :]  # (NB, W, BT)
        p = jnp.sum(jnp.where(oh, bp_k.astype(jnp.int32), 0), axis=1)
        # single-plane decode: bM in base-5 digit 0, from-self bits of
        # the four gap states in the remaining bits (see module doc)
        bits = p // 5
        bit_s = (bits >> jnp.maximum(s - 1, 0)) & 1
        prev = jnp.where(s == 0, p % 5, s * bit_s)
        op = jnp.where(
            s == 0, OP_M, jnp.where((s == 1) | (s == 3), OP_D, OP_I)
        )
        op = jnp.where(act, op, OP_NONE).astype(jnp.int8)
        di = (act & ((s == 0) | (s == 2) | (s == 4))).astype(jnp.int32)
        dj = (act & ((s == 0) | (s == 1) | (s == 3))).astype(jnp.int32)
        i = i - di
        j = j - dj
        s = jnp.where(act, prev, s)
        return (i, j, s), op

    ks = jnp.arange(K1 - 1, -1, -1, dtype=jnp.int32)
    xs = (bp_t, offs_t[::-1], ks)
    (fi, fj, _), ops_rev = lax.scan(
        step, (m, n, fstate.astype(jnp.int32)), xs, unroll=SCAN_UNROLL
    )
    return ops_rev[::-1], fi, fj


def viterbi_traceback_batch(
    bp_raw, offsets, m, n, fstate
) -> list[list[tuple[int, int]]]:
    """Batched device traceback -> per-read global cigars.

    ``bp_raw`` is the plan's k-major plane tensor; ``offsets/m/n`` are
    the host batch metadata and ``fstate`` the (B,) final states.
    Pinned to ops.viterbi.viterbi_traceback (host walk) by tests; only
    the (K1, NB, BT) op matrix crosses to the host.
    """
    NB, K1, W, BT = bp_raw.shape
    offsets = np.asarray(offsets)
    m = np.asarray(m)
    n = np.asarray(n)
    fstate = np.asarray(fstate)
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
    fs = np.zeros(NB * BT, np.int32)
    fs[:B] = fstate
    ops, fi, fj = _viterbi_ops_raw_jit(
        jnp.asarray(bp_raw),
        jnp.asarray(offs_t),
        jnp.asarray(mm.reshape(NB, BT)),
        jnp.asarray(nn.reshape(NB, BT)),
        jnp.asarray(fs.reshape(NB, BT)),
    )
    ops_b = np.asarray(ops).transpose(1, 2, 0).reshape(NB * BT, K1)
    fi = np.asarray(fi).reshape(-1)
    fj = np.asarray(fj).reshape(-1)
    out = []
    for b in range(B):
        if fi[b] != 0 or fj[b] != 0:
            # a malformed band/backpointer stream must not kill the
            # whole batch (and a bare assert vanishes under python -O,
            # silently emitting a truncated cigar): mark THIS read
            # failed — callers drop empty-cigar records
            import logging

            logging.getLogger(__name__).error(
                "viterbi traceback left the band for read %d "
                "(stopped at i=%d j=%d); emitting no alignment",
                b, int(fi[b]), int(fj[b]),
            )
            out.append([])
            continue
        sel = ops_b[b][ops_b[b] != OP_NONE]
        cigar: list[tuple[int, int]] = []
        for op in sel:
            cop = _OP_TO_CIG[int(op)]
            if cigar and cigar[-1][0] == cop:
                cigar[-1] = (cop, cigar[-1][1] + 1)
            else:
                cigar.append((cop, 1))
        out.append(cigar)
    return out
