"""Pallas traceback kernels: walk direction/backpointer bands on-chip.

The batched traceback is one cell per diagonal per read — trivially
cheap compute — but as an XLA ``lax.scan`` it costs ~80 µs per
diagonal on the TPU runtime (while-loop overhead on tiny slices):
~1-3 s per production batch, which would cap the decode path at a few
hundred reads/s against kernels that sustain >10k reads/s.  Here the
same walk runs INSIDE a Pallas program over the kernels' native
k-major layouts, streaming the direction rows HBM->VMEM in
double-buffered chunks exactly like the compute kernels stream their
code tensors; per-diagonal cost drops to VPU arithmetic on one
(W, BT) tile.

Two kernels:

* MEA/realign: ascending walk over 2-bit direction codes
  (ops.pairhmm_pallas_realign ``dirs_raw``) — op semantics pinned to
  ops.mea.mea_traceback_fwd.
* Viterbi: descending walk over the base-5-packed backpointer planes
  (ops.pairhmm_pallas_viterbi ``bp_raw``) — pinned to
  ops.viterbi.viterbi_traceback.

Both emit a (K1, BT) op-code matrix (8 diagonals packed per sublane
row) that the host run-length encodes; integer state (i, j, ...) is
carried as exact small f32 (< 2^24).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT = 128
CHUNK = 128  # diagonals per DMA chunk (multiple of 8)
OP_M, OP_D, OP_I, OP_NONE = 0.0, 1.0, 2.0, 3.0


def _mea_tb_kernel(
    mn_ref,  # (2, BT) int32 VMEM block: rows m, n (o[0] is always 0)
    dirs_hbm,  # (NB, K1_pad, W, BT) int8 (k-major direction codes)
    d1_hbm,  # (NB, K1_pad // 64, 8, BT) int8: Lipschitz-1 band deltas,
    #          8 diagonals bit-packed per byte (bit q of the byte at
    #          row r = d1 of diagonal r*8+q) — 1 bit per diagonal per
    #          lane instead of a 4-byte offset, ~30x less upload
    ops_hbm,  # (NB, K1_pad // 8, 8, BT) int8 out
    bufD,  # (2*CHUNK, W, BT) int8
    bufO,  # (2, CHUNK // 64, 8, BT) int8 packed deltas
    bufOut,  # (2, CHUNK // 8, 8, BT) f32 staged op codes
    st,  # (4, 1, BT) f32: i, j, nk, running band offset o
    in_sems,  # DMA (2, 2)
    out_sems,  # DMA (2,)
    *,
    k1_pad: int,
    W: int,
):
    bt = pl.program_id(0)
    n_chunks = k1_pad // CHUNK
    rows_per_chunk = CHUNK // 8

    row_f = lax.broadcasted_iota(jnp.int32, (W, BT), 0).astype(jnp.float32)
    zeros_w = jnp.zeros((W, BT), jnp.float32)
    sub8 = lax.broadcasted_iota(jnp.int32, (8, BT), 0)
    m = mn_ref[0:1, :].astype(jnp.float32)
    n = mn_ref[1:2, :].astype(jnp.float32)

    def dmas(c, slot):
        return (
            pltpu.make_async_copy(
                dirs_hbm.at[bt, pl.ds(c * CHUNK, CHUNK)],
                bufD.at[pl.ds(slot * CHUNK, CHUNK)],
                in_sems.at[0, slot],
            ),
            pltpu.make_async_copy(
                d1_hbm.at[bt, pl.ds(c * (CHUNK // 64), CHUNK // 64)],
                bufO.at[slot],
                in_sems.at[1, slot],
            ),
        )

    for d in dmas(0, 0):
        d.start()
    st[0] = jnp.zeros((1, BT), jnp.float32)  # i
    st[1] = jnp.zeros((1, BT), jnp.float32)  # j
    st[2] = jnp.zeros((1, BT), jnp.float32)  # nk
    st[3] = jnp.zeros((1, BT), jnp.float32)  # running o (o[0] = 0)

    def chunk_body(c, _):
        slot = lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            for d in dmas(c + 1, 1 - slot):
                d.start()

        for d in dmas(c, slot):
            d.wait()

        @pl.when(c >= 2)
        def _():
            pltpu.make_async_copy(
                bufOut.at[slot],
                ops_hbm.at[bt, pl.ds(0, rows_per_chunk)],
                out_sems.at[slot],
            ).wait()

        def row_body(r, _):
            # this row's packed delta byte: tile r // 8, sub-row r % 8
            # (dynamic sub-row via an 8-wide one-hot, never a gather)
            dtile = bufO[slot, lax.div(r, 8)].astype(jnp.int32)
            rsel = jnp.where(sub8 == lax.rem(r, 8), 1, 0)
            dbyte = jnp.sum(dtile * rsel, axis=0, keepdims=True)  # (1, BT)
            outs = []
            for sub in range(8):
                # diagonal index: traced (c, r) + static sub, as exact f32
                k_f = (c * CHUNK + r * 8 + sub).astype(jnp.float32)
                # integrate the band offset: o_k = o_{k-1} + d1_k
                d1_k = ((dbyte >> sub) & 1).astype(jnp.float32)
                o_k = st[3] + d1_k
                st[3] = o_k
                i = st[0]
                j = st[1]
                nk = st[2]
                active = jnp.where(
                    (nk == k_f) & ((i < m) | (j < n)), 1.0, 0.0
                )
                b = j - o_k  # (1, BT) f32
                in_band = jnp.where((b >= 0) & (b < W), 1.0, 0.0)
                tile = bufD[slot * CHUNK + r * 8 + sub]  # (W, BT) int8
                # broadcast b to (W, BT) BEFORE comparing: (1, BT)
                # predicates into (W, BT) shapes hit the v5e i1
                # sublane-broadcast miscompile (realign kernel note)
                b_full = zeros_w + b
                oh = jnp.where(row_f == b_full, 1.0, 0.0)
                d = jnp.sum(
                    oh * tile.astype(jnp.float32), axis=0, keepdims=True
                )
                d = d * in_band + OP_NONE * (1.0 - in_band)
                can_diag = jnp.where(
                    (d == 0.0) & (i < m) & (j < n), 1.0, 0.0
                )
                can_del = jnp.where((d == 1.0) & (j < n), 1.0, 0.0)
                can_ins = jnp.where((d == 2.0) & (i < m), 1.0, 0.0)
                none_can = (
                    (1.0 - can_diag) * (1.0 - can_del) * (1.0 - can_ins)
                )
                fb_del = none_can * jnp.where(j < n, 1.0, 0.0)
                op = jnp.where(
                    can_diag > 0,
                    OP_M,
                    jnp.where((can_del + fb_del) > 0, OP_D, OP_I),
                )
                op = op * active + OP_NONE * (1.0 - active)
                di = active * jnp.where((op == OP_M) | (op == OP_I), 1.0, 0.0)
                dj = active * jnp.where((op == OP_M) | (op == OP_D), 1.0, 0.0)
                i = i + di
                j = j + dj
                nk = nk * (1.0 - active) + (i + j) * active
                st[0] = i
                st[1] = j
                st[2] = nk
                outs.append(op)

            @pl.when(slot == 0)
            def _(outs=outs, r=r):
                bufOut[0, r] = jnp.concatenate(outs, axis=0)

            @pl.when(slot == 1)
            def _(outs=outs, r=r):
                bufOut[1, r] = jnp.concatenate(outs, axis=0)

            return 0

        lax.fori_loop(0, rows_per_chunk, row_body, 0)
        pltpu.make_async_copy(
            bufOut.at[slot],
            ops_hbm.at[bt, pl.ds(c * rows_per_chunk, rows_per_chunk)],
            out_sems.at[slot],
        ).start()
        return 0

    lax.fori_loop(0, n_chunks, chunk_body, 0)
    for slot in range(min(2, n_chunks)):
        pltpu.make_async_copy(
            bufOut.at[slot],
            ops_hbm.at[bt, pl.ds(0, rows_per_chunk)],
            out_sems.at[slot],
        ).wait()


@functools.partial(
    jax.jit, static_argnames=("k1_pad", "NB", "W", "interpret")
)
def _mea_tb_call(mn, dirs_raw, d1p, k1_pad, NB, W, interpret=False):
    kernel = functools.partial(_mea_tb_kernel, k1_pad=k1_pad, W=W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(
                (None, 2, BT), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2 * CHUNK, W, BT), jnp.int8),
            pltpu.VMEM((2, CHUNK // 64, 8, BT), jnp.int8),
            pltpu.VMEM((2, CHUNK // 8, 8, BT), jnp.float32),
            pltpu.VMEM((4, 1, BT), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((NB, k1_pad // 8, 8, BT), jnp.float32),
    ]
    (ops,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(mn, dirs_raw, d1p)
    # ops stay f32 inside the kernel (traced-index int8 stores
    # miscompile on v5e); cast on device so the host pull is 1 byte
    # per diagonal, not 4 (the pull is the walker's dominant cost on
    # remote runtimes)
    return ops.astype(jnp.int8)


def _vit_tb_kernel(
    mns_ref,  # (4, BT) int32 VMEM block: rows m, n, fstate, o[k1_pad-1]
    bp_hbm,  # (NB, K1_pad, W, BT) int8 (k-major packed plane rows)
    d1_hbm,  # (NB, K1_pad // 64, 8, BT) int8: band deltas, 8 diagonals
    #          bit-packed per byte (same layout as the MEA walker) —
    #          1 bit per diagonal per lane instead of a 4-byte offset,
    #          the walk integrates o DESCENDING from mns row 3
    ops_hbm,  # (NB, K1_pad // 8, 8, BT) f32 out
    bufD,  # (2 * CHUNK, W, BT) int8
    bufO,  # (2, CHUNK // 64, 8, BT) int8 packed deltas
    bufOut,  # (2, CHUNK // 8, 8, BT) f32
    st,  # (4, 1, BT) f32: i, j, s, running band offset o
    in_sems,  # DMA (2, 2)
    out_sems,  # DMA (2,)
    *,
    k1_pad: int,
    W: int,
):
    """Descending Viterbi walk over the single packed backpointer plane
    (pairhmm_pallas_viterbi module doc: bM base-5 digit + from-self
    bits; semantics of ops.viterbi.viterbi_traceback; op at column k =
    move INTO diagonal k's path cell).  One (W, BT) one-hot contraction
    per diagonal — the MEA walker's floor — instead of round 4's two."""
    bt = pl.program_id(0)
    n_chunks = k1_pad // CHUNK
    rows_per_chunk = CHUNK // 8

    row_f = lax.broadcasted_iota(jnp.int32, (W, BT), 0).astype(jnp.float32)
    zeros_w = jnp.zeros((W, BT), jnp.float32)
    sub8 = lax.broadcasted_iota(jnp.int32, (8, BT), 0)
    m = mns_ref[0:1, :].astype(jnp.float32)
    n = mns_ref[1:2, :].astype(jnp.float32)

    def dmas(c, slot):
        return (
            pltpu.make_async_copy(
                bp_hbm.at[bt, pl.ds(c * CHUNK, CHUNK)],
                bufD.at[pl.ds(slot * CHUNK, CHUNK)],
                in_sems.at[0, slot],
            ),
            pltpu.make_async_copy(
                d1_hbm.at[bt, pl.ds(c * (CHUNK // 64), CHUNK // 64)],
                bufO.at[slot],
                in_sems.at[1, slot],
            ),
        )

    for d in dmas(n_chunks - 1, (n_chunks - 1) % 2):
        d.start()
    st[0] = m
    st[1] = n
    st[2] = mns_ref[2:3, :].astype(jnp.float32)
    st[3] = mns_ref[3:4, :].astype(jnp.float32)  # o at the top diagonal

    def mod5(x):
        return x - 5.0 * jnp.floor(x / 5.0)

    def chunk_body(ci, _):
        c = n_chunks - 1 - ci
        slot = lax.rem(c, 2)

        @pl.when(c >= 1)
        def _():
            for d in dmas(c - 1, 1 - slot):
                d.start()

        for d in dmas(c, slot):
            d.wait()

        @pl.when(ci >= 2)
        def _():
            pltpu.make_async_copy(
                bufOut.at[slot],
                ops_hbm.at[bt, pl.ds(0, rows_per_chunk)],
                out_sems.at[slot],
            ).wait()

        def row_body(ri, _):
            r = rows_per_chunk - 1 - ri
            # this row's packed delta byte (bit sub = d1 of diagonal
            # r*8 + sub), extracted with an 8-wide one-hot — never a
            # gather (MEA walker pattern)
            dtile = bufO[slot, lax.div(r, 8)].astype(jnp.int32)
            rsel = jnp.where(sub8 == lax.rem(r, 8), 1, 0)
            dbyte = jnp.sum(dtile * rsel, axis=0, keepdims=True)  # (1, BT)
            outs = [None] * 8
            for sub in range(7, -1, -1):
                k_f = (c * CHUNK + r * 8 + sub).astype(jnp.float32)
                i = st[0]
                j = st[1]
                s = st[2]
                at_origin = jnp.where((i == 0) & (j == 0), 1.0, 0.0)
                active = jnp.where(i + j == k_f, 1.0, 0.0) * (
                    1.0 - at_origin
                )
                o_k = st[3]
                b_full = zeros_w + (j - o_k)
                oh = jnp.where(row_f == b_full, 1.0, 0.0)
                base = slot * CHUNK + (r * 8 + sub)
                p = jnp.sum(
                    oh * bufD[base].astype(jnp.float32), axis=0,
                    keepdims=True,
                )
                # single-plane decode: bits = from-self flags of the 4
                # gap states; prev = 0 (match) or self
                bits = jnp.floor(p / 5.0)

                def mod2(x):
                    return x - 2.0 * jnp.floor(x / 2.0)

                prev = jnp.where(
                    s == 0.0,
                    mod5(p),
                    jnp.where(
                        s == 1.0,
                        1.0 * mod2(bits),
                        jnp.where(
                            s == 2.0,
                            2.0 * mod2(jnp.floor(bits / 2.0)),
                            jnp.where(
                                s == 3.0,
                                3.0 * mod2(jnp.floor(bits / 4.0)),
                                4.0 * jnp.floor(bits / 8.0),
                            ),
                        ),
                    ),
                )
                is_del = jnp.where((s == 1.0) | (s == 3.0), 1.0, 0.0)
                op = jnp.where(
                    s == 0.0, OP_M, jnp.where(is_del > 0, OP_D, OP_I)
                )
                op = op * active + OP_NONE * (1.0 - active)
                di = active * jnp.where(
                    (s == 0.0) | (s == 2.0) | (s == 4.0), 1.0, 0.0
                )
                dj = active * jnp.where(
                    (s == 0.0) | (s == 1.0) | (s == 3.0), 1.0, 0.0
                )
                st[0] = i - di
                st[1] = j - dj
                st[2] = s * (1.0 - active) + prev * active
                # integrate the band offset downward: o[k-1] = o[k] - d1[k]
                st[3] = o_k - ((dbyte >> sub) & 1).astype(jnp.float32)
                outs[sub] = op

            @pl.when(slot == 0)
            def _(outs=outs, r=r):
                bufOut[0, r] = jnp.concatenate(outs, axis=0)

            @pl.when(slot == 1)
            def _(outs=outs, r=r):
                bufOut[1, r] = jnp.concatenate(outs, axis=0)

            return 0

        lax.fori_loop(0, rows_per_chunk, row_body, 0)
        pltpu.make_async_copy(
            bufOut.at[slot],
            ops_hbm.at[bt, pl.ds(c * rows_per_chunk, rows_per_chunk)],
            out_sems.at[slot],
        ).start()
        return 0

    lax.fori_loop(0, n_chunks, chunk_body, 0)
    for slot in range(min(2, n_chunks)):
        pltpu.make_async_copy(
            bufOut.at[slot],
            ops_hbm.at[bt, pl.ds(0, rows_per_chunk)],
            out_sems.at[slot],
        ).wait()


@functools.partial(
    jax.jit, static_argnames=("k1_pad", "NB", "W", "interpret")
)
def _vit_tb_call(mns, bp_rows, d1p, k1_pad, NB, W, interpret=False):
    kernel = functools.partial(_vit_tb_kernel, k1_pad=k1_pad, W=W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(
                (None, 4, BT), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2 * CHUNK, W, BT), jnp.int8),
            pltpu.VMEM((2, CHUNK // 64, 8, BT), jnp.int8),
            pltpu.VMEM((2, CHUNK // 8, 8, BT), jnp.float32),
            pltpu.VMEM((4, 1, BT), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((NB, k1_pad // 8, 8, BT), jnp.float32),
    ]
    (ops,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(mns, bp_rows, d1p)
    return ops.astype(jnp.int8)


@jax.jit
def _pack_ops2(ops):
    """(NB, R, 8, BT) int8 op codes (0..3) -> (NB, R, 2, BT) with 4
    diagonals packed per byte: the walker ops matrix is the decode
    path's host pull (10 MB/batch at B=128), and op codes are 2 bits —
    pack on device, unpack with vectorised numpy on the host."""
    o = ops.astype(jnp.int32)
    rows = []
    for j in range(2):
        b = o[:, :, 4 * j, :]
        for t in range(1, 4):
            b = b | (o[:, :, 4 * j + t, :] << (2 * t))
        rows.append(b)
    return jnp.stack(rows, axis=2).astype(jnp.int8)


_OPS_LUT = None


def _unpack_ops2(packed, NB: int, k1_pad: int) -> np.ndarray:
    """(NB, R, 2, BT) packed bytes -> (NB*BT, k1_pad) op codes.

    One 256-entry uint32 LUT gather (byte -> its 4 op codes,
    little-endian) instead of four shift/mask passes over the 4x
    output array."""
    global _OPS_LUT
    if _OPS_LUT is None:
        b = np.arange(256, dtype=np.uint32)
        _OPS_LUT = (
            (b & 3)
            | (((b >> 2) & 3) << 8)
            | (((b >> 4) & 3) << 16)
            | (((b >> 6) & 3) << 24)
        ).astype(np.uint32)
    pk = np.asarray(packed).view(np.uint8)
    R = pk.shape[1]
    lanes = np.ascontiguousarray(
        pk.transpose(0, 3, 1, 2)
    ).reshape(NB * BT, R * 2)
    out = np.ascontiguousarray(_OPS_LUT[lanes])
    return out.view(np.uint8).reshape(NB * BT, k1_pad).view(np.int8)


def _lane_rows(values, NB: int, B: int, dtype=np.int32) -> np.ndarray:
    """(B,) per-read values -> (NB, BT) lane-ordered rows (pad zero).

    NEVER assign through ``arr[:, i].reshape(-1)[:B] = v``: for NB > 1
    that slice is non-contiguous, reshape returns a COPY, and the
    assignment is silently lost (it only works at NB == 1).
    """
    flat = np.zeros(NB * BT, dtype)
    flat[:B] = values
    return flat.reshape(NB, BT)


def _d1_packed_lanes(offsets, NB: int, B: int, k1_pad: int, K1: int):
    """Lane-ordered 1-bit/diagonal band-delta stream + top offsets.

    Returns (d1p_l (NB, k1_pad // 64, 8, BT) int8, o_last (NB*BT,)
    int32 = o[k1_pad - 1] per lane) — the packed layout both walkers
    consume (o[0] = 0 by band construction; pad lanes/rows have zero
    deltas).  All heavy work runs on the B REAL lanes only: building
    these over NB*BT pad lanes cost ~0.23 s/batch at B=1024 (a 340 MB
    offsets alloc), several times the walker kernel itself.
    """
    offsets = np.asarray(offsets)
    ko = min(offsets.shape[1], K1)
    d1 = np.zeros((B, k1_pad), np.uint8)
    d1[:, 1:ko] = (
        offsets[:, 1:ko] - offsets[:, : ko - 1]
    ).astype(np.uint8)
    d1p = np.packbits(d1, axis=1, bitorder="little")  # (B, k1_pad/8)
    full = np.zeros((NB * BT, k1_pad // 8), np.uint8)
    full[:B] = d1p
    d1p_l = np.ascontiguousarray(
        full.reshape(NB, BT, k1_pad // 64, 8).transpose(0, 2, 3, 1)
    ).view(np.int8)
    o_last = np.zeros(NB * BT, np.int32)
    o_last[:B] = offsets[:, ko - 1]  # constant past the real diagonals
    return d1p_l, o_last


def viterbi_traceback_ops_pallas(
    bp_raw, offsets, m, n, fstate, interpret: bool = False
) -> np.ndarray:
    """(B, K1) int8 op codes from the raw Viterbi plane layout."""
    NB, K1, W, BT_ = bp_raw.shape
    assert BT_ == BT
    offsets = np.asarray(offsets)
    m = np.asarray(m)
    n = np.asarray(n)
    fstate = np.asarray(fstate)
    B = m.shape[0]
    assert CHUNK % 64 == 0, "delta packing needs CHUNK in 64s"
    k1_pad = -(-K1 // CHUNK) * CHUNK

    # band offsets ride as 1 bit/diagonal (o integrated DESCENDING from
    # the top offset in mns row 3) — the 4-byte/diagonal offsets upload
    # was ~1.6 s/batch at B=1024 on the remote link, dwarfing the walk
    d1p_l, o_last = _d1_packed_lanes(offsets, NB, B, k1_pad, K1)
    mns = np.zeros((NB, 4, BT), np.int32)
    mns[:, 0] = _lane_rows(m, NB, B)
    mns[:, 1] = _lane_rows(n, NB, B)
    mns[:, 2] = _lane_rows(fstate, NB, B)
    mns[:, 3] = o_last.reshape(NB, BT)

    import jax.numpy as jnp_

    bp_rows = jnp_.asarray(bp_raw)
    if k1_pad != K1:
        pad = jnp_.zeros((NB, k1_pad - K1, W, BT), jnp_.int8)
        bp_rows = jnp_.concatenate([bp_rows, pad], axis=1)

    ops = _unpack_ops2(
        _pack_ops2(
            _vit_tb_call(
                jnp.asarray(mns), bp_rows, jnp.asarray(d1p_l),
                k1_pad, NB, W, interpret,
            )
        ),
        NB, k1_pad,
    )
    return ops[:B, :K1]


def viterbi_cigars_pallas(
    bp_raw, offsets, m, n, fstate, interpret: bool = False
) -> list[list[tuple[int, int]]]:
    """Cigars via the on-chip Viterbi walker."""
    from nanopore_tpu.ops.mea import rle_ops_batch

    ops = viterbi_traceback_ops_pallas(
        bp_raw, offsets, m, n, fstate, interpret
    )
    return rle_ops_batch(ops)


def traceback_cigars_pallas(
    dirs_raw, offsets, m, n, interpret: bool = False
) -> list[list[tuple[int, int]]]:
    """Cigars via the on-chip walker (the TPU production traceback)."""
    from nanopore_tpu.ops.mea import rle_ops_batch

    ops = mea_traceback_ops_pallas(dirs_raw, offsets, m, n, interpret)
    return rle_ops_batch(ops)


def mea_traceback_ops_pallas(
    dirs_raw, offsets, m, n, interpret: bool = False
) -> np.ndarray:
    """(B, K1) int8 op codes from the raw direction layout, walked on
    chip.  Same op semantics as ops.mea._traceback_ops_jit."""
    NB, K1, W, BT_ = dirs_raw.shape
    assert BT_ == BT
    offsets = np.asarray(offsets)
    m = np.asarray(m)
    n = np.asarray(n)
    B = m.shape[0]
    assert CHUNK % 64 == 0, "delta packing needs CHUNK in 64s"
    k1_pad = -(-K1 // CHUNK) * CHUNK

    # pack the Lipschitz-1 band deltas to 1 bit per diagonal per lane
    # (o[0] is 0 by band construction; the kernel integrates)
    d1p_l, _ = _d1_packed_lanes(offsets, NB, B, k1_pad, K1)
    mn = np.zeros((NB, 2, BT), np.int32)
    mn[:, 0] = _lane_rows(m, NB, B)
    mn[:, 1] = _lane_rows(n, NB, B)

    dr = dirs_raw
    if k1_pad != K1:
        import jax.numpy as jnp_

        pad = jnp_.full(
            (NB, k1_pad - K1, W, BT), 3, jnp_.int8
        )  # DIR_NONE
        dr = jnp_.concatenate([jnp_.asarray(dirs_raw), pad], axis=1)

    ops = _unpack_ops2(
        _pack_ops2(
            _mea_tb_call(
                jnp.asarray(mn), jnp.asarray(dr), jnp.asarray(d1p_l),
                k1_pad, NB, W, interpret,
            )
        ),
        NB, k1_pad,
    )
    # (NB, k1_pad//8, 8, BT) -> (B, K1)
    return ops[:B, :K1]
