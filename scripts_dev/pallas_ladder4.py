"""Ladder 4: bisect the production forward kernel's 876us/diag pathology.

ladder3's mk_real_body (the same diag_step math) measured 292 ns per
diagonal PAIR, but the production pairhmm_pallas kernel runs at ~876 us
per diagonal.  Variants here add the production wrapper's features to
the ladder3 real body one at a time:

  A  real body (ladder3 baseline, re-measured)
  B  + fin/acc/kend logic (row-0 slice + log per diagonal, ls carry)
  C  + separate (1, BT) scratch refs for ls/rs/acc
  D  + nested chunk/pair fori_loops with double-buffered chunk DMA
  E  = the actual production _kernel via pallas_forward_loglik
"""

import time

import numpy as np

import os
cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanopore_tpu.ops.pairhmm_pallas import _unpack_onehots

W, B = 64, 128
N_SMALL, N_BIG = 2048, 16384
CHUNK = 128


def time_call(call, *args):
    t0 = time.time()
    np.asarray(call(*args))  # compile+warm
    tc = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(call(*args))
        times.append(time.time() - t0)
    return min(times), tc


def make_diag_step(d1_ref, tf_ref, emf_ref, egf_ref, row, zeros, zb,
                   kend=None):
    def shift_w(arr, sh):
        if sh == 0:
            return arr
        rolled = pltpu.roll(arr, (-sh) % W, 0)
        if sh > 0:
            return jnp.where(row < W - sh, rolled, 0.0)
        return jnp.where(row >= -sh, rolled, 0.0)

    def sel_shift(arr, sv, lo, hi):
        out = shift_w(arr, lo)
        for v in range(lo + 1, hi + 1):
            out = jnp.where(sv == v, shift_w(arr, v), out)
        return out

    def diag_step(kn, xy, prev, prevprev, r, ls_cur, acc, rescale):
        d1 = d1_ref[kn % 2048]
        d2 = d1_ref[(kn + 1) % 2048]
        oh_x, oh_y = _unpack_onehots(xy)
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
        diag = [sel_shift(pp, d2, -1, 1) * r for pp in prevprev]
        left = [sel_shift(pv, d1 - 1, -1, 0) for pv in prev]
        up = [sel_shift(pv, d1, 0, 1) for pv in prev]

        def trans_sum(preds, dest):
            a2 = tf_ref[0 * 5 + dest] * preds[0]
            for s2 in range(1, 5):
                a2 = a2 + tf_ref[s2 * 5 + dest] * preds[s2]
            return a2

        new = [
            e_m * trans_sum(diag, 0),
            gx1 * trans_sum(left, 1),
            gy2 * trans_sum(up, 2),
            gx3 * trans_sum(left, 3),
            gy4 * trans_sum(up, 4),
        ]
        safe_inv = None
        ls_new = ls_cur
        if rescale:
            scale = jnp.max(new[0], axis=0, keepdims=True)
            for s2 in range(1, 5):
                scale = jnp.maximum(
                    scale, jnp.max(new[s2], axis=0, keepdims=True)
                )
            safe = jnp.where(scale > 0, scale, 1.0)
            safe_inv = 1.0 / safe
            new = [arr * safe_inv for arr in new]
            if ls_cur is not None:
                ls_new = ls_cur + jnp.log(safe)
        if acc is not None:
            fin = zb
            for s2 in range(5):
                fin = fin + new[s2][0:1, :]
            acc = acc + jnp.where(
                kn == kend,
                jnp.log(jnp.maximum(fin, 1e-37)) + ls_new, 0.0,
            )
        return new, ls_new, safe_inv, acc

    return diag_step


def mk_A(n_iter):
    """ladder3 real body baseline."""
    def k(d1_ref, tf_ref, emf_ref, egf_ref, xy_hbm, out_ref, sA, sB,
          rs, buf, sem):
        pltpu.make_async_copy(xy_hbm.at[pl.ds(0, 256)], buf, sem).start()
        pltpu.make_async_copy(xy_hbm.at[pl.ds(0, 256)], buf, sem).wait()
        row = lax.broadcasted_iota(jnp.int32, (W, B), 0)
        zeros = jnp.zeros((W, B), jnp.float32)
        zb = jnp.zeros((1, B), jnp.float32)
        step = make_diag_step(d1_ref, tf_ref, emf_ref, egf_ref, row,
                              zeros, zb)

        def body(ip, _):
            t = (2 * ip) % 256
            a = [sA[st] for st in range(5)]
            b = [sB[st] for st in range(5)]
            nb, _, _, _ = step(2 * ip + 1, buf[t], a, b, rs[0], None,
                               None, False)
            one = jnp.ones((1, B), jnp.float32)
            na, _, inv, _ = step(2 * ip + 2, buf[t + 1], nb, a, one,
                                 None, None, True)
            for st in range(5):
                sB[st] = nb[st]
                sA[st] = na[st]
            rs[0] = inv
            return 0

        lax.fori_loop(0, n_iter // 2, body, 0)
        out_ref[:, :] = jnp.sum(sA[0], axis=0, keepdims=True)
    return k


def mk_B(n_iter):
    """+ fin/acc/kend + ls carry (SSA through fori_loop carry)."""
    def k(d1_ref, tf_ref, emf_ref, egf_ref, kend_ref, xy_hbm, out_ref,
          sA, sB, rs, buf, sem):
        pltpu.make_async_copy(xy_hbm.at[pl.ds(0, 256)], buf, sem).start()
        pltpu.make_async_copy(xy_hbm.at[pl.ds(0, 256)], buf, sem).wait()
        row = lax.broadcasted_iota(jnp.int32, (W, B), 0)
        zeros = jnp.zeros((W, B), jnp.float32)
        zb = jnp.zeros((1, B), jnp.float32)
        kend = kend_ref[:, :]
        step = make_diag_step(d1_ref, tf_ref, emf_ref, egf_ref, row,
                              zeros, zb, kend)

        def body(ip, carry):
            ls, acc = carry
            t = (2 * ip) % 256
            a = [sA[st] for st in range(5)]
            b = [sB[st] for st in range(5)]
            nb, ls_b, _, acc = step(2 * ip + 1, buf[t], a, b, rs[0], ls,
                                    acc, False)
            one = jnp.ones((1, B), jnp.float32)
            na, ls_a, inv, acc = step(2 * ip + 2, buf[t + 1], nb, a, one,
                                      ls_b, acc, True)
            for st in range(5):
                sB[st] = nb[st]
                sA[st] = na[st]
            rs[0] = inv
            return (ls_a, acc)

        ls, acc = lax.fori_loop(0, n_iter // 2, body, (zb, zb))
        out_ref[:, :] = acc + ls
    return k


def mk_C(n_iter):
    """+ ls/rs/acc as separate (1, B) VMEM scratch refs (production)."""
    def k(d1_ref, tf_ref, emf_ref, egf_ref, kend_ref, xy_hbm, out_ref,
          sA, sB, ls_ref, rs_ref, acc_ref, buf, sem):
        pltpu.make_async_copy(xy_hbm.at[pl.ds(0, 256)], buf, sem).start()
        pltpu.make_async_copy(xy_hbm.at[pl.ds(0, 256)], buf, sem).wait()
        row = lax.broadcasted_iota(jnp.int32, (W, B), 0)
        zeros = jnp.zeros((W, B), jnp.float32)
        zb = jnp.zeros((1, B), jnp.float32)
        ls_ref[:, :] = zb
        rs_ref[:, :] = jnp.ones((1, B), jnp.float32)
        acc_ref[:, :] = zb
        kend = kend_ref[:, :]
        step = make_diag_step(d1_ref, tf_ref, emf_ref, egf_ref, row,
                              zeros, zb, kend)

        def body(ip, _):
            t = (2 * ip) % 256
            a = [sA[st] for st in range(5)]
            b = [sB[st] for st in range(5)]
            nb, ls_b, _, acc = step(2 * ip + 1, buf[t], a, b,
                                    rs_ref[:, :], ls_ref[:, :],
                                    acc_ref[:, :], False)
            one = jnp.ones((1, B), jnp.float32)
            na, ls_a, inv, acc = step(2 * ip + 2, buf[t + 1], nb, a, one,
                                      ls_b, acc, True)
            for st in range(5):
                sB[st] = nb[st]
                sA[st] = na[st]
            ls_ref[:, :] = ls_a
            rs_ref[:, :] = inv
            acc_ref[:, :] = acc
            return 0

        lax.fori_loop(0, n_iter // 2, body, 0)
        out_ref[:, :] = acc_ref[:, :]
    return k


def mk_D(n_iter):
    """+ nested chunk/pair loops with double-buffered chunk DMA."""
    def k(d1_ref, tf_ref, emf_ref, egf_ref, kend_ref, xy_hbm, out_ref,
          sA, sB, rs, buf, sems):
        row = lax.broadcasted_iota(jnp.int32, (W, B), 0)
        zeros = jnp.zeros((W, B), jnp.float32)
        zb = jnp.zeros((1, B), jnp.float32)
        kend = kend_ref[:, :]
        step = make_diag_step(d1_ref, tf_ref, emf_ref, egf_ref, row,
                              zeros, zb, kend)
        n_chunks = n_iter // CHUNK
        pairs_per_chunk = CHUNK // 2

        def chunk_dma(c, slot):
            src = lax.rem(c * CHUNK, 2048)
            return pltpu.make_async_copy(
                xy_hbm.at[pl.ds(src, CHUNK)],
                buf.at[pl.ds(slot * CHUNK, CHUNK)],
                sems.at[slot],
            )

        chunk_dma(0, 0).start()

        def chunk_body(c, carry):
            ls, acc = carry
            slot = lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                chunk_dma(c + 1, 1 - slot).start()

            chunk_dma(c, slot).wait()
            base = slot * CHUNK

            def pair_body(ip, carry2):
                ls2, acc2 = carry2
                t = base + ip * 2
                kk = (c * pairs_per_chunk + ip) * 2
                a = [sA[st] for st in range(5)]
                b = [sB[st] for st in range(5)]
                nb, ls_b, _, acc2 = step(kk + 1, buf[t], a, b, rs[0],
                                         ls2, acc2, False)
                one = jnp.ones((1, B), jnp.float32)
                na, ls_a, inv, acc2 = step(kk + 2, buf[t + 1], nb, a,
                                           one, ls_b, acc2, True)
                for st in range(5):
                    sB[st] = nb[st]
                    sA[st] = na[st]
                rs[0] = inv
                return (ls_a, acc2)

            return lax.fori_loop(0, pairs_per_chunk, pair_body,
                                 (ls, acc))

        ls, acc = lax.fori_loop(0, n_chunks, chunk_body, (zb, zb))
        out_ref[:, :] = acc + ls
    return k


def run(name, make_kernel, scratch, n_scal, extra_inputs=()):
    results = []
    for n_iter in (N_SMALL, N_BIG):
        kernel = make_kernel(n_iter)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_scal,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(
                extra_inputs
            ) + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch),
        )
        xy = jnp.asarray(
            np.random.default_rng(0).integers(0, 40, (2048, W, B), np.int8)
        )
        rng = np.random.default_rng(1)
        scalars = (
            jnp.asarray(rng.integers(0, 2, 2048), jnp.int32),
            jnp.asarray(rng.random(25), jnp.float32),
            jnp.asarray(rng.random(36), jnp.float32),
            jnp.asarray(rng.random(30), jnp.float32),
        )

        def call(*a):
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
            )(*a)

        call = jax.jit(call)
        t, tc = time_call(call, *(scalars + tuple(extra_inputs) + (xy,)))
        results.append((t, tc))
    (t1, c1), (t2, c2) = results
    marginal = (t2 - t1) / (N_BIG - N_SMALL) * 1e9
    print("%-34s small %8.4fs  big %8.4fs  marginal %9.1f ns/iter "
          "(compiles %.0fs/%.0fs)" % (name, t1, t2, marginal, c1, c2),
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    f32 = jnp.float32
    kend = jnp.full((1, B), 9_999, jnp.int32)
    base_scratch = [
        pltpu.VMEM((5, W, B), f32), pltpu.VMEM((5, W, B), f32),
        pltpu.VMEM((1, 1, B), f32), pltpu.VMEM((256, W, B), jnp.int8),
        pltpu.SemaphoreType.DMA(()),
    ]
    run("A real body", mk_A, base_scratch, 4)
    run("B + fin/acc/ls (SSA carry)", mk_B, base_scratch, 4,
        extra_inputs=(kend,))
    run("C + (1,B) scratch ls/rs/acc", mk_C, [
        pltpu.VMEM((5, W, B), f32), pltpu.VMEM((5, W, B), f32),
        pltpu.VMEM((1, B), f32), pltpu.VMEM((1, B), f32),
        pltpu.VMEM((1, B), f32), pltpu.VMEM((256, W, B), jnp.int8),
        pltpu.SemaphoreType.DMA(()),
    ], 4, extra_inputs=(kend,))
    run("D + chunked double-buffer DMA", mk_D, [
        pltpu.VMEM((5, W, B), f32), pltpu.VMEM((5, W, B), f32),
        pltpu.VMEM((1, 1, B), f32), pltpu.VMEM((2 * CHUNK, W, B), jnp.int8),
        pltpu.SemaphoreType.DMA((2,)),
    ], 4, extra_inputs=(kend,))


if __name__ == "__main__":
    main()
