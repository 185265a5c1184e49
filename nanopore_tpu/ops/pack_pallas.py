"""On-device band construction: stream pack + Pallas packer kernel.

The reference's ``cactus_realign`` builds its DP band INSIDE the binary
from raw sequences plus a guide cigar (the whole interface is
``echo <cigar> | cactus_realign ref.fa read.fa``, reference
/root/reference/nanopore/analyses/utils.py:587).  Round-3's host pack
(ops.pairhmm_pallas_realign.pack_pallas_pairs) instead materialised the
full packed band code tensor on the host — ``2 * W`` bytes per lattice
diagonal per read, ~665 KB per 5 kb read, 85 MB per 128-read batch —
whose upload pinned end-to-end throughput at tunnel bandwidth and whose
construction cost seconds of host CPU per batch.

This module moves the band construction on device.  The key identity:
along the anti-diagonal sweep the band's x-window and y-window are
SLIDING WINDOWS over the raw sequences — the band is Lipschitz-1, so
per diagonal exactly ONE new symbol enters (an x symbol when the band
shifts, a y symbol when it does not):

    xwin_k[w] = x[o[k] + w - 1]        (shifts up when d1[k] = 1)
    ywin_k[w] = y[k - o[k] - w - 1]    (shifts down when d1[k] = 0)

so the host only streams, per diagonal per read, ONE byte:

    bits 0-2  the entering symbol (x[o[k]+W-2] if d1[k] else y[k-o[k]-1])
    bit 6     d1[k]   = o[k] - o[k-1]   (the band delta)
    bit 7     d1[k-1]                    (the previous delta)

~1 byte/diagonal/read (~10 KB per 5 kb read, ~65x less than the packed
band) plus a one-off (W,) x-window seed per read.  The packer kernel
integrates the band offset from the delta bits, slides both windows,
recomputes cell validity from (k, o[k], w, m, n) alone, and writes the
EXISTING packed ``xyc`` layout (byte-identical to pack_pallas_pairs) to
HBM — the validated realign/Viterbi kernels and their compile caches
are untouched.

Cost on device: ~35 VPU ops per (W, 128-lane) diagonal tile — a few ms
per batch tile, hidden behind the main kernels.  Host cost drops to the
O(k) per-read offset/stream construction (no (k, W) band tensors at
all).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanopore_tpu.ops.pairhmm import KernelParams, band_offsets_from_cigar

BT = 128  # batch-tile width (lanes) — matches the compute kernels
SEG = 16  # output staging granularity (diagonals)
CHUNK = 128  # input stream diagonals per DMA chunk
SENT = (5 << 3) | 5  # all-sentinel packed code


def _pack_kernel(
    mn_ref,  # (2, BT) int32 VMEM block: per-lane m, n
    initx_ref,  # (W, BT) int8 VMEM block: x-window seed x[w-1] (row 0 junk)
    stream_hbm,  # (NB, k_pad // 8, 8, BT) int8 per-diagonal stream bytes
    xyc_hbm,  # (NB * k_pad, W, BT) int8 out: packed band codes, row r = diag r+1
    bufS,  # (2, CHUNK // 8, 8, BT) int8 stream chunks (double-buffered)
    outbuf,  # (2 * SEG, W, BT) int8 staged output rows
    xw,  # (W, BT) f32 sliding x window (codes as exact small floats)
    yw,  # (W, BT) f32 sliding y window
    ov,  # (1, BT) f32 running band offset o[k]
    in_sems,  # DMA (2,)
    out_sems,  # DMA (2,)
    *,
    k_pad: int,
    W: int,
):
    bt = pl.program_id(0)
    n_chunks = k_pad // CHUNK
    segs_per_chunk = CHUNK // SEG

    row_f = lax.broadcasted_iota(jnp.int32, (W, BT), 0).astype(jnp.float32)
    zeros = jnp.zeros((W, BT), jnp.float32)
    is_top = row_f == float(W - 1)  # x insertion edge
    is_bot = row_f == 0.0  # y insertion edge
    m_w = zeros + mn_ref[0:1, :].astype(jnp.float32)
    n_w = zeros + mn_ref[1:2, :].astype(jnp.float32)

    # window seeds: xwin_0[w] = x[w - 1] (host-clipped; w = 0 never
    # consumed valid), ywin_0 holds no valid cells at all — every used
    # y value enters through the stream (y[0], y[1], ... insert in
    # order at w=0 on the d1=0 steps)
    xw[...] = initx_ref[...].astype(jnp.float32)
    yw[...] = jnp.full((W, BT), 5.0, jnp.float32)
    ov[...] = jnp.zeros((1, BT), jnp.float32)

    def in_dma(c, slot):
        return pltpu.make_async_copy(
            stream_hbm.at[bt, pl.ds(c * (CHUNK // 8), CHUNK // 8)],
            bufS.at[slot],
            in_sems.at[slot],
        )

    in_dma(0, 0).start()

    def chunk_body(c, _):
        slot = lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            in_dma(c + 1, 1 - slot).start()

        in_dma(c, slot).wait()

        def seg_body(sl, _):
            sg = c * segs_per_chunk + sl  # global segment index
            oslot = lax.rem(sg, 2)

            @pl.when(sg >= 2)
            def _():
                pltpu.make_async_copy(
                    outbuf.at[pl.ds(oslot * SEG, SEG)],
                    xyc_hbm.at[pl.ds(bt * k_pad, SEG)],
                    out_sems.at[oslot],
                ).wait()

            base_k = (sg * SEG).astype(jnp.float32)  # diag of kl=0 is +1
            for kl in range(SEG):
                r = sl * (SEG // 8) + kl // 8
                sub = kl % 8
                byte = bufS[slot, r][sub : sub + 1, :].astype(jnp.int32)
                d1 = ((byte >> 6) & 1).astype(jnp.float32)  # (1, BT)
                ent = (byte & 7).astype(jnp.float32)
                top = (byte & 0xC0).astype(jnp.float32)

                d1w = zeros + d1
                entw = zeros + ent
                # slide the windows: exactly one symbol enters per diag
                xs = pltpu.roll(xw[...], W - 1, 0)  # shift up by 1
                xs = jnp.where(is_top, entw, xs)
                xw[...] = xw[...] + d1w * (xs - xw[...])
                ys = pltpu.roll(yw[...], 1, 0)  # shift down by 1
                ys = jnp.where(is_bot, entw, ys)
                yw[...] = ys + d1w * (yw[...] - ys)

                o_k = ov[...] + d1
                ov[...] = o_k

                # cell validity from geometry alone (the sentinel
                # contract of pack_pallas_pairs: code 5 wherever the
                # cell or its x/y index leaves the lattice)
                j = (zeros + o_k) + row_f
                i = (base_k + float(kl + 1)) - j
                ok = (
                    jnp.where(j <= n_w, 1.0, 0.0)
                    * jnp.where(i >= 0.0, 1.0, 0.0)
                    * jnp.where(i <= m_w, 1.0, 0.0)
                )
                xok = ok * jnp.where(j >= 1.0, 1.0, 0.0)
                yok = ok * jnp.where(i >= 1.0, 1.0, 0.0)
                xv = jnp.where(xok > 0, xw[...], 5.0)
                yv = jnp.where(yok > 0, yw[...], 5.0)

                val = xv * 8.0 + yv + (zeros + top)
                # int8 store: wrap to signed range in f32 (f32->int8
                # conversion is only defined in-range)
                val = val - 256.0 * jnp.where(val >= 128.0, 1.0, 0.0)
                tile = val.astype(jnp.int8)

                # static-indexed stores under slot predicates (traced
                # int8 scratch stores miscompile on v5e — realign
                # kernel dirs_buf note)
                @pl.when(oslot == 0)
                def _s0(tile=tile, kl=kl):
                    outbuf[kl] = tile

                @pl.when(oslot == 1)
                def _s1(tile=tile, kl=kl):
                    outbuf[SEG + kl] = tile

            pltpu.make_async_copy(
                outbuf.at[pl.ds(oslot * SEG, SEG)],
                xyc_hbm.at[pl.ds(bt * k_pad + sg * SEG, SEG)],
                out_sems.at[oslot],
            ).start()
            return 0

        lax.fori_loop(0, segs_per_chunk, seg_body, 0)
        return 0

    lax.fori_loop(0, n_chunks, chunk_body, 0)

    total_segs = k_pad // SEG
    for oslot in range(min(2, total_segs)):
        pltpu.make_async_copy(
            outbuf.at[pl.ds(oslot * SEG, SEG)],
            xyc_hbm.at[pl.ds(bt * k_pad, SEG)],
            out_sems.at[oslot],
        ).wait()


@functools.partial(
    jax.jit, static_argnames=("k_pad", "NB", "W", "interpret")
)
def _pack_call(mn, initx, stream, k_pad, NB, W, interpret=False):
    # SEG % 8 == 0 keeps the stream-byte sub-row index STATIC inside
    # the unrolled segment loop (the (8, BT) stream rows are sliced at
    # kl % 8); CHUNK % SEG and k_pad % CHUNK bound the DMA tiling.
    assert SEG % 8 == 0 and CHUNK % SEG == 0 and k_pad % CHUNK == 0
    kernel = functools.partial(_pack_kernel, k_pad=k_pad, W=W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(
                (None, 2, BT), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, W, BT), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK // 8, 8, BT), jnp.int8),  # bufS
            pltpu.VMEM((2 * SEG, W, BT), jnp.int8),  # outbuf
            pltpu.VMEM((W, BT), jnp.float32),  # xw
            pltpu.VMEM((W, BT), jnp.float32),  # yw
            pltpu.VMEM((1, BT), jnp.float32),  # ov
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((NB * k_pad, W, BT), jnp.int8),
    ]
    (xyc,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(mn, initx, stream)
    return xyc.reshape(NB, k_pad, W, BT)


def pack_stream_pairs(
    pairs: list[tuple[np.ndarray, np.ndarray, list[tuple[int, int]]]],
    params: KernelParams,
    band_width: int = 64,
    k_max: int | None = None,
) -> dict:
    """Host side of the on-device pack: per-diagonal stream bytes.

    Same contract as pack_pallas_pairs minus the band tensor: the
    returned dict carries ``stream``/``initx``/``mn`` instead of
    ``xyc``; run the packer via :func:`materialize_xyc` (or let
    ops.dispatch do it) to obtain the device-resident ``xyc``.
    """
    from nanopore_tpu.ops.pairhmm_pallas_realign import (
        CHUNK as K_CHUNK,
        _param_scalars,
    )

    W = band_width
    B = len(pairs)
    ms = np.array([len(y) for _, y, _ in pairs], np.int32)
    ns = np.array([len(x) for x, _, _ in pairs], np.int32)
    K = int(k_max if k_max is not None else (ms + ns).max())
    k_pad = -(-K // K_CHUNK) * K_CHUNK
    B_pad = -(-B // BT) * BT
    NB = B_pad // BT

    stream = np.zeros((B_pad, k_pad), np.uint8)
    initx = np.zeros((B_pad, W), np.uint8)
    offsets = np.zeros((B, k_pad + 1), np.int32)
    karr = np.arange(1, k_pad + 1, dtype=np.int64)
    for b, (x, y, cig) in enumerate(pairs):
        x = np.asarray(x)
        y = np.asarray(y)
        m, n = len(y), len(x)
        o = band_offsets_from_cigar(cig, m, n, W, k_pad)
        offsets[b] = o
        d1 = (o[1:] - o[:-1]).astype(np.uint8)
        xq = x.astype(np.uint8) if n else np.zeros(1, np.uint8)
        yq = y.astype(np.uint8) if m else np.zeros(1, np.uint8)
        ix = np.clip(o[1:].astype(np.int64) + W - 2, 0, max(n - 1, 0))
        iy = np.clip(karr - o[1:] - 1, 0, max(m - 1, 0))
        ent = np.where(d1 == 1, xq[ix], yq[iy])
        byte = ent | (d1 << 6)
        byte[1:] |= d1[:-1] << 7
        stream[b] = byte
        w = np.arange(W, dtype=np.int64)
        initx[b] = xq[np.clip(w - 1, 0, max(n - 1, 0))]

    stream_l = np.ascontiguousarray(
        stream.reshape(NB, BT, k_pad // 8, 8).transpose(0, 2, 3, 1)
    ).view(np.int8)
    initx_l = np.ascontiguousarray(
        initx.reshape(NB, BT, W).transpose(0, 2, 1)
    ).view(np.int8)
    # per-lane scalars: NEVER via arr[:, i].reshape(-1)[:B] = v — that
    # reshape COPIES for NB > 1 and the assignment is lost (the round-4
    # NB=2 packer bug, caught by tests/test_pack_pallas TestMultiTile)
    mn = np.zeros((NB, 2, BT), np.int32)
    flat_m = np.zeros(B_pad, np.int32)
    flat_m[:B] = ms
    flat_n = np.zeros(B_pad, np.int32)
    flat_n[:B] = ns
    mn[:, 0] = flat_m.reshape(NB, BT)
    mn[:, 1] = flat_n.reshape(NB, BT)

    tf, emf, egf = _param_scalars(params)
    kend = np.full(B_pad, -1, np.int32)
    kend[:B] = (ms + ns).astype(np.int32)
    return {
        "stream": stream_l,
        "initx": initx_l,
        "mn": mn,
        "tf": tf,
        "emf": emf,
        "egf": egf,
        "kend": kend.reshape(NB, 1, BT),
        "k_pad": k_pad,
        "B": B,
        "K": K,
        "NB": NB,
        "W": W,
        "offsets": offsets,
        "m": ms,
        "n": ns,
        "k_end": (ms + ns).astype(np.int32),
    }


def materialize_xyc(prep: dict, device=None, interpret: bool = False):
    """Upload the stream inputs and run the packer kernel; returns the
    prep dict with a DEVICE-resident ``xyc`` (and the stream keys
    dropped).  The plans' ``put(prep['xyc'])`` then no-ops."""
    put = (
        jnp.asarray
        if device is None
        else (lambda a: jax.device_put(a, device))
    )
    xyc = _pack_call(
        put(prep["mn"]),
        put(prep["initx"]),
        put(prep["stream"]),
        prep["k_pad"],
        prep["NB"],
        prep["W"],
        interpret,
    )
    out = {k: v for k, v in prep.items() if k not in ("stream", "initx", "mn")}
    out["xyc"] = xyc
    return out
