"""Ladder 6: cost decomposition of the CURRENT per-lane-band diag body.

Round-2 production kernels (pairhmm_pallas{,_realign}) moved band
shifts from scalar-prefetch selects to per-LANE f32 mask blends so each
read carries its own band geometry.  This ladder times the new body and
its candidate optimisations via N-scaling (marginal ns/iteration, two
iteration counts — axon's ~23ms fixed call overhead cancels in the
slope).

Variants (each = one diagonal PAIR per iteration, like production):
  trivial            per-iteration floor
  body/current       fwd_diag_step as shipped (lane blends, one-hots)
  body/tsum-first    transitions summed BEFORE shifting (5 lane-shifts
                     instead of 15)
  body/shared-rolls  tsum-first + rolls computed once per tile and
                     blended (no roll duplication inside lane_shift)
  body/static-shift  scalar-prefetch sel_shift (round-1 uniform bands;
                     lower bound for the shift machinery)
  body/no-emis       emissions replaced by constants (bounds one-hot +
                     emission cost)
  body/no-rescale    rescale never (bounds the (1,B) max/log cost)
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
NS = 5


def time_call(call, *args):
    np.asarray(call(*args))  # compile+warm
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
            np.random.default_rng(0).integers(0, 256, (256, W, B), np.int32)
            .astype(np.int8)
        )

        def call(*a):
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
                interpret=os.environ.get("LADDER_INTERPRET") == "1",
            )(*a)

        call = jax.jit(call)
        results.append(time_call(call, *(tuple(scalars) + (xy,))))
    t1, t2 = results
    marginal = (t2 - t1) / (N_BIG - N_SMALL) * 1e9
    print("%-22s small %7.4fs  big %7.4fs  marginal %9.1f ns/pair "
          "(%6.1f ns/diag)" % (name, t1, t2, marginal, marginal / 2),
          flush=True)


def mk_trivial(n_iter):
    def k(xy_hbm, out_ref, s):
        def body(t, _):
            s[0] = s[0] * 0.5 + 1.0
            return 0
        lax.fori_loop(0, n_iter, body, 0)
        out_ref[:, :] = jnp.sum(s[0], axis=0, keepdims=True)
    return k


def _mk_body(n_iter, mode):
    """One fwd diagonal-pair per iteration over a resident code buffer."""

    def k(tf_ref, emf_ref, egf_ref, xy_hbm, out_ref, sA, sB, rs, buf, sem):
        cp = pltpu.make_async_copy(xy_hbm.at[pl.ds(0, 256)], buf, sem)
        cp.start()
        cp.wait()
        row = lax.broadcasted_iota(jnp.int32, (W, B), 0)
        zeros = jnp.zeros((W, B), jnp.float32)
        ones_b = jnp.ones((1, B), jnp.float32)

        def shift_w(arr, s, fill=0.0):
            if s == 0:
                return arr
            rolled = pltpu.roll(arr, (-s) % W, 0)
            if s > 0:
                return jnp.where(row < W - s, rolled, fill)
            return jnp.where(row >= -s, rolled, fill)

        def lane_shift(arr, d, lo, hi):
            out = None
            for v in range(lo, hi + 1):
                mv = (d == v).astype(jnp.float32)
                sv = shift_w(arr, v)
                out = mv * sv if out is None else out + mv * sv
            return out

        def lane_blend(variants, d, lo, hi):
            """Blend PRE-SHIFTED variants[v-lo] by per-lane mask."""
            out = None
            for v in range(lo, hi + 1):
                mv = (d == v).astype(jnp.float32)
                out = (mv * variants[v - lo] if out is None
                       else out + mv * variants[v - lo])
            return out

        def diag_step(xy, prev, prevprev, r, rescale):
            xy32 = xy.astype(jnp.int32)
            d1 = (xy32 >> 6) & 1
            d1p = (xy32 >> 7) & 1
            d2 = d1 + d1p - 1
            xv = (xy32 >> 3) & 7
            yv = xy32 & 7
            if mode == "no-emis":
                e_m = zeros + 0.7
                gx1 = zeros + 0.3
                gx3 = zeros + 0.3
                gy2 = zeros + 0.3
                gy4 = zeros + 0.3
            else:
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

            def trans_sum(preds, dest):
                a2 = tf_ref[0 * 5 + dest] * preds[0]
                for s2 in range(1, NS):
                    a2 = a2 + tf_ref[s2 * 5 + dest] * preds[s2]
                return a2

            if mode in ("tsum-first", "shared-rolls", "no-emis",
                        "no-rescale"):
                # sum transitions BEFORE shifting: 5 shifted tiles
                td = trans_sum(prevprev, 0)
                tl1 = trans_sum(prev, 1)
                tu2 = trans_sum(prev, 2)
                tl3 = trans_sum(prev, 3)
                tu4 = trans_sum(prev, 4)
                if mode == "shared-rolls":
                    td_v = [shift_w(td, v) for v in (-1, 0, 1)]
                    diag0 = lane_blend(td_v, d2, -1, 1) * r
                    l1_v = [shift_w(tl1, v) for v in (-1, 0)]
                    l3_v = [shift_w(tl3, v) for v in (-1, 0)]
                    u2_v = [shift_w(tu2, v) for v in (0, 1)]
                    u4_v = [shift_w(tu4, v) for v in (0, 1)]
                    left1 = lane_blend(l1_v, d1 - 1, -1, 0)
                    left3 = lane_blend(l3_v, d1 - 1, -1, 0)
                    up2 = lane_blend(u2_v, d1, 0, 1)
                    up4 = lane_blend(u4_v, d1, 0, 1)
                else:
                    diag0 = lane_shift(td, d2, -1, 1) * r
                    left1 = lane_shift(tl1, d1 - 1, -1, 0)
                    left3 = lane_shift(tl3, d1 - 1, -1, 0)
                    up2 = lane_shift(tu2, d1, 0, 1)
                    up4 = lane_shift(tu4, d1, 0, 1)
                new = [e_m * diag0, gx1 * left1, gy2 * up2,
                       gx3 * left3, gy4 * up4]
            elif mode == "static-shift":
                diag = [shift_w(pp, 0) * r for pp in prevprev]
                left = [shift_w(pv, -1) for pv in prev]
                up = [pv for pv in prev]
                new = [
                    e_m * trans_sum(diag, 0),
                    gx1 * trans_sum(left, 1),
                    gy2 * trans_sum(up, 2),
                    gx3 * trans_sum(left, 3),
                    gy4 * trans_sum(up, 4),
                ]
            else:  # current
                diag = [lane_shift(pp, d2, -1, 1) * r for pp in prevprev]
                left = [lane_shift(pv, d1 - 1, -1, 0) for pv in prev]
                up = [lane_shift(pv, d1, 0, 1) for pv in prev]
                new = [
                    e_m * trans_sum(diag, 0),
                    gx1 * trans_sum(left, 1),
                    gy2 * trans_sum(up, 2),
                    gx3 * trans_sum(left, 3),
                    gy4 * trans_sum(up, 4),
                ]
            if rescale and mode != "no-rescale":
                scale = jnp.max(new[0], axis=0, keepdims=True)
                for s2 in range(1, NS):
                    scale = jnp.maximum(
                        scale, jnp.max(new[s2], axis=0, keepdims=True))
                safe = jnp.where(scale > 0, scale, 1.0)
                inv = 1.0 / safe
                new = [arr * inv for arr in new]
                return new, inv
            return new, ones_b

        def body(ip, _):
            t = lax.rem(2 * ip, 256)
            a = [sA[st] for st in range(NS)]
            b = [sB[st] for st in range(NS)]
            nb, _ = diag_step(buf[t], a, b, rs[0], False)
            na, inv = diag_step(buf[t], nb, a, ones_b, True)
            for st in range(NS):
                sB[st] = nb[st]
                sA[st] = na[st]
            rs[0] = inv
            return 0

        lax.fori_loop(0, n_iter, body, 0)
        out_ref[:, :] = jnp.sum(sA[0], axis=0, keepdims=True)
    return k


def main():
    print("devices:", jax.devices(), flush=True)
    f32 = jnp.float32
    tf = jnp.asarray(np.random.default_rng(1).random(25), f32)
    emf = jnp.asarray(np.random.default_rng(2).random(36), f32)
    egf = jnp.asarray(np.random.default_rng(3).random(30), f32)
    scratch = [
        pltpu.VMEM((NS, W, B), f32), pltpu.VMEM((NS, W, B), f32),
        pltpu.VMEM((1, 1, B), f32), pltpu.VMEM((256, W, B), jnp.int8),
        pltpu.SemaphoreType.DMA(()),
    ]
    run_variant("trivial", mk_trivial, [pltpu.VMEM((1, W, B), f32)])
    for mode in ("current", "tsum-first", "shared-rolls", "static-shift",
                 "no-emis", "no-rescale"):
        run_variant("body/" + mode,
                    lambda n, m=mode: _mk_body(n, m), scratch,
                    scalars=(tf, emf, egf))


if __name__ == "__main__":
    main()
