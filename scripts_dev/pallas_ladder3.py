"""Ladder 3: MARGINAL per-iteration cost via N-scaling.

Axon has ~23ms fixed per-call overhead that swamped ladders 1-2.  Here
every variant runs at two iteration counts; the slope isolates the true
per-iteration cost.  Variants add the real kernel's features one at a
time to find the 1.8ms/step culprit.
"""

import os
import time

import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W, B = 64, 128
N_SMALL, N_BIG = 2048, 16384


def time_call(call, *args):
    out = np.asarray(call(*args))  # compile+warm
    times = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(call(*args))
        times.append(time.time() - t0)
    return min(times)


def run_variant(name, make_kernel, scratch, scalars=()):
    results = []
    for n_iter in (N_SMALL, N_BIG):
        kernel = make_kernel(n_iter)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars),
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch),
        )
        xy = jnp.asarray(
            np.random.default_rng(0).integers(0, 40, (256, W, B), np.int8)
        )

        def call(*a):
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
            )(*a)

        call = jax.jit(call)
        results.append(time_call(call, *(tuple(scalars) + (xy,))))
    t1, t2 = results
    marginal = (t2 - t1) / (N_BIG - N_SMALL) * 1e9
    print("%-26s small %7.4fs  big %7.4fs  marginal %9.1f ns/iter" % (
        name, t1, t2, marginal), flush=True)


def mk_trivial(n_iter):
    def k(xy_hbm, out_ref, s):
        def body(t, _):
            s[0] = s[0] * 0.5 + 1.0
            return 0
        lax.fori_loop(0, n_iter, body, 0)
        out_ref[:, :] = jnp.sum(s[0], axis=0, keepdims=True)
    return k


def mk_smem_static(n_iter):
    def k(tf_ref, xy_hbm, out_ref, s, s2):
        def body(t, _):
            acc = s[0]
            v = s2[0]
            for i in range(70):
                acc = acc + tf_ref[i % 25] * v
            s[0] = acc * 0.5
            return 0
        lax.fori_loop(0, n_iter, body, 0)
        out_ref[:, :] = jnp.sum(s[0], axis=0, keepdims=True)
    return k


def mk_smem_traced(n_iter):
    def k(dd_ref, xy_hbm, out_ref, s):
        def body(t, _):
            d1 = dd_ref[t % 2048]
            d2 = dd_ref[(t + 1) % 2048]
            s[0] = s[0] * 0.5 + (d1 + d2).astype(jnp.float32)
            return 0
        lax.fori_loop(0, n_iter, body, 0)
        out_ref[:, :] = jnp.sum(s[0], axis=0, keepdims=True)
    return k


def mk_scalar_select(n_iter):
    def k(dd_ref, xy_hbm, out_ref, s):
        def body(t, _):
            d1 = dd_ref[t % 2048]
            v = s[0]
            for i in range(20):
                v = jnp.where(d1 == (i % 2), v * 1.01, v)
            s[0] = v * 0.5
            return 0
        lax.fori_loop(0, n_iter, body, 0)
        out_ref[:, :] = jnp.sum(s[0], axis=0, keepdims=True)
    return k


def mk_rolls(n_iter):
    def k(xy_hbm, out_ref, s):
        row = lax.broadcasted_iota(jnp.int32, (W, B), 0)

        def body(t, _):
            v = s[0]
            acc = v
            for i in range(14):
                sh = (i % 3)  # 0,1,2
                r = pltpu.roll(v, (W - sh) % W, 0) if sh else v
                r = jnp.where(row >= sh, r, 0.0)
                acc = acc + 0.1 * r
            s[0] = acc * 0.1
            return 0
        lax.fori_loop(0, n_iter, body, 0)
        out_ref[:, :] = jnp.sum(s[0], axis=0, keepdims=True)
    return k


def mk_vec1b(n_iter):
    def k(xy_hbm, out_ref, s, sc):
        def body(t, _):
            v = s[0]
            mx = jnp.max(v, axis=0, keepdims=True)  # (1,B)
            safe = jnp.where(mx > 0, mx, 1.0)
            inv = 1.0 / safe
            sc[0] = sc[0] + jnp.log(safe)
            s[0] = v * inv + 0.1
            return 0
        lax.fori_loop(0, n_iter, body, 0)
        out_ref[:, :] = sc[0]
    return k


def mk_real_body(n_iter):
    """The actual kernel's diag_step, on a fixed VMEM code tile."""
    NEG_STATES = 5

    def k(d1_ref, tf_ref, emf_ref, egf_ref, xy_hbm, out_ref, sA, sB, ls, rs,
          acc_r, buf, sem):
        pltpu.make_async_copy(xy_hbm.at[pl.ds(0, 256)], buf, sem).start()
        pltpu.make_async_copy(xy_hbm.at[pl.ds(0, 256)], buf, sem).wait()
        row = lax.broadcasted_iota(jnp.int32, (W, B), 0)
        zeros = jnp.zeros((W, B), jnp.float32)

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

        def diag_step(kn, xy, prev, prevprev, r, rescale):
            d1 = d1_ref[kn % 2048]
            d2 = d1_ref[(kn + 1) % 2048]
            xy32 = xy.astype(jnp.int32)
            xv = xy32 >> 3
            yv = xy32 & 7
            oh_x = [(xv == v).astype(jnp.float32) for v in range(5)]
            oh_y = [(yv == v).astype(jnp.float32) for v in range(5)]
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
                for s2 in range(1, NEG_STATES):
                    a2 = a2 + tf_ref[s2 * 5 + dest] * preds[s2]
                return a2

            new = [
                e_m * trans_sum(diag, 0),
                gx1 * trans_sum(left, 1),
                gy2 * trans_sum(up, 2),
                gx3 * trans_sum(left, 3),
                gy4 * trans_sum(up, 4),
            ]
            if rescale:
                scale = jnp.max(new[0], axis=0, keepdims=True)
                for s2 in range(1, NEG_STATES):
                    scale = jnp.maximum(
                        scale, jnp.max(new[s2], axis=0, keepdims=True)
                    )
                safe = jnp.where(scale > 0, scale, 1.0)
                inv = 1.0 / safe
                new = [arr * inv for arr in new]
                return new, inv
            return new, None

        def body(ip, _):
            t = (2 * ip) % 256
            a = [sA[st] for st in range(5)]
            b = [sB[st] for st in range(5)]
            nb, _ = diag_step(2 * ip + 1, buf[t], a, b, rs[0], False)
            one = jnp.ones((1, B), jnp.float32)
            na, inv = diag_step(2 * ip + 2, buf[t], nb, a, one, True)
            for st in range(5):
                sB[st] = nb[st]
                sA[st] = na[st]
            rs[0] = inv
            return 0

        lax.fori_loop(0, n_iter // 2, body, 0)
        out_ref[:, :] = jnp.sum(sA[0], axis=0, keepdims=True)
    return k


def main():
    print("devices:", jax.devices(), flush=True)
    f32 = jnp.float32
    tf = jnp.asarray(np.random.default_rng(1).random(25), f32)
    emf = jnp.asarray(np.random.default_rng(2).random(36), f32)
    egf = jnp.asarray(np.random.default_rng(3).random(30), f32)
    dd = jnp.asarray(np.random.default_rng(4).integers(0, 2, 2048), jnp.int32)

    run_variant("trivial", mk_trivial, [pltpu.VMEM((1, W, B), f32)])
    run_variant("smem static x70", mk_smem_static,
                [pltpu.VMEM((1, W, B), f32), pltpu.VMEM((1, W, B), f32)],
                scalars=(tf,))
    run_variant("smem traced x2", mk_smem_traced,
                [pltpu.VMEM((1, W, B), f32)], scalars=(dd,))
    run_variant("scalar select x20", mk_scalar_select,
                [pltpu.VMEM((1, W, B), f32)], scalars=(dd,))
    run_variant("rolls x14", mk_rolls, [pltpu.VMEM((1, W, B), f32)])
    run_variant("(1,B) max/log/div", mk_vec1b,
                [pltpu.VMEM((1, W, B), f32), pltpu.VMEM((1, 1, B), f32)])
    run_variant(
        "real body x2", mk_real_body,
        [pltpu.VMEM((5, W, B), f32), pltpu.VMEM((5, W, B), f32),
         pltpu.VMEM((1, 1, B), f32), pltpu.VMEM((1, 1, B), f32),
         pltpu.VMEM((1, 1, B), f32), pltpu.VMEM((256, W, B), jnp.int8),
         pltpu.SemaphoreType.DMA(())],
        scalars=(dd, tf, emf, egf),
    )


if __name__ == "__main__":
    main()
