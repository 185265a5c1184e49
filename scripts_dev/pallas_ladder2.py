"""Ladder 2: cost of fori_loop iterations inside ONE grid step.

Ladder 1 showed ~5.4us of overhead PER GRID STEP (even empty), so the
diagonal loop must live inside a single grid step.  Here: what does one
fori_loop iteration cost, with/without dynamic VMEM slicing and with a
realistic step body?
"""

import os
import time
import functools

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

N, W, B = 4096, 64, 128
CH = 256  # in-kernel DMA chunk


def run_variant(name, kernel, scratch, n_iters=N):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # xy stays in HBM
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch),
    )
    xy = jnp.asarray(
        np.random.default_rng(0).integers(0, 40, (N, W, B), np.int8)
    )

    @jax.jit
    def call(x):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        )(x)

    t0 = time.time()
    out = np.asarray(call(xy))
    tc = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = np.asarray(call(xy))
        times.append(time.time() - t0)
    best = min(times)
    print("%-28s compile %6.1fs   best %8.4fs   %8.1f ns/iter" % (
        name, tc, best, best / n_iters * 1e9), flush=True)
    return out


# A: trivial fori body, all-static scratch RMW
def k_fori_trivial(xy_hbm, out_ref, s):
    def body(t, _):
        s[0] = s[0] * 0.5 + 1.0
        return 0

    lax.fori_loop(0, N, body, 0)
    out_ref[:, :] = jnp.sum(s[0], axis=0, keepdims=True)


# B: fori body with dynamic VMEM slice from a preloaded buffer
def k_fori_dynread(xy_hbm, out_ref, s, buf, sem):
    pltpu.make_async_copy(xy_hbm.at[pl.ds(0, CH)], buf, sem).start()
    pltpu.make_async_copy(xy_hbm.at[pl.ds(0, CH)], buf, sem).wait()

    def body(t, _):
        v = buf[t % CH].astype(jnp.float32)
        s[0] = s[0] * 0.5 + v
        return 0

    lax.fori_loop(0, N, body, 0)
    out_ref[:, :] = jnp.sum(s[0], axis=0, keepdims=True)


# C: realistic pair-HMM-like body (static reads, rolls, FMAs), unroll 2
def k_fori_realistic(xy_hbm, out_ref, sA, sB, buf, sem):
    pltpu.make_async_copy(xy_hbm.at[pl.ds(0, CH)], buf, sem).start()
    pltpu.make_async_copy(xy_hbm.at[pl.ds(0, CH)], buf, sem).wait()
    row = lax.broadcasted_iota(jnp.int32, (W, B), 0)

    def one_diag(xy, prev, prevprev):
        xy32 = xy.astype(jnp.int32)
        xv = xy32 >> 3
        yv = xy32 & 7
        oh_x = [(xv == i).astype(jnp.float32) for i in range(5)]
        oh_y = [(yv == i).astype(jnp.float32) for i in range(5)]
        e = jnp.zeros((W, B), jnp.float32)
        for a in range(5):
            inner = jnp.zeros((W, B), jnp.float32)
            for cc in range(5):
                inner = inner + (0.01 * (a * 5 + cc)) * oh_y[cc]
            e = e + oh_x[a] * inner
        new = []
        for st in range(5):
            pp = prevprev[st]
            r1 = jnp.where(row >= 1, pltpu.roll(pp, 1, 0), 0.0)
            r2 = jnp.where(row < W - 1, pltpu.roll(pp, W - 1, 0), 0.0)
            pv = prev[st]
            r3 = jnp.where(row >= 1, pltpu.roll(pv, 1, 0), 0.0)
            acc = e * 0.2
            for s2 in range(5):
                acc = acc + (0.05 * (s2 + st)) * (
                    r1 if s2 % 3 == 0 else (r2 if s2 % 3 == 1 else r3)
                )
            new.append(acc)
        return new

    def body(ip, _):
        t = (2 * ip) % CH
        a = [sA[st] for st in range(5)]
        b = [sB[st] for st in range(5)]
        nb = one_diag(buf[t], a, b)
        na = one_diag(buf[t], nb, a)
        # rescale every second diagonal
        scale = jnp.max(na[0], axis=0, keepdims=True)
        for st in range(1, 5):
            scale = jnp.maximum(scale, jnp.max(na[st], axis=0, keepdims=True))
        inv = 1.0 / jnp.where(scale > 0, scale, 1.0)
        for st in range(5):
            sB[st] = nb[st]
            sA[st] = na[st] * inv
        return 0

    lax.fori_loop(0, N // 2, body, 0)
    out_ref[:, :] = jnp.sum(sA[0], axis=0, keepdims=True)


# D: C plus double-buffered in-kernel DMA chunk streaming
def k_fori_realistic_dma(xy_hbm, out_ref, sA, sB, buf, sem):
    n_chunks = N // CH

    def start(slot, ci):
        pltpu.make_async_copy(
            xy_hbm.at[pl.ds(ci * CH, CH)], buf.at[slot], sem.at[slot]
        ).start()

    def wait(slot, ci):
        pltpu.make_async_copy(
            xy_hbm.at[pl.ds(ci * CH, CH)], buf.at[slot], sem.at[slot]
        ).wait()

    start(0, 0)
    row = lax.broadcasted_iota(jnp.int32, (W, B), 0)

    def one_diag(xy, prev, prevprev):
        xy32 = xy.astype(jnp.int32)
        xv = xy32 >> 3
        yv = xy32 & 7
        oh_x = [(xv == i).astype(jnp.float32) for i in range(5)]
        oh_y = [(yv == i).astype(jnp.float32) for i in range(5)]
        e = jnp.zeros((W, B), jnp.float32)
        for a in range(5):
            inner = jnp.zeros((W, B), jnp.float32)
            for cc in range(5):
                inner = inner + (0.01 * (a * 5 + cc)) * oh_y[cc]
            e = e + oh_x[a] * inner
        new = []
        for st in range(5):
            pp = prevprev[st]
            r1 = jnp.where(row >= 1, pltpu.roll(pp, 1, 0), 0.0)
            r2 = jnp.where(row < W - 1, pltpu.roll(pp, W - 1, 0), 0.0)
            pv = prev[st]
            r3 = jnp.where(row >= 1, pltpu.roll(pv, 1, 0), 0.0)
            acc = e * 0.2
            for s2 in range(5):
                acc = acc + (0.05 * (s2 + st)) * (
                    r1 if s2 % 3 == 0 else (r2 if s2 % 3 == 1 else r3)
                )
            new.append(acc)
        return new

    def chunk_body(ci, _):
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            start((ci + 1) % 2, ci + 1)

        wait(slot, ci)

        def body(ip, _):
            t = 2 * ip
            a = [sA[st] for st in range(5)]
            b = [sB[st] for st in range(5)]
            nb = one_diag(buf[slot, t], a, b)
            na = one_diag(buf[slot, t + 1], nb, a)
            scale = jnp.max(na[0], axis=0, keepdims=True)
            for st in range(1, 5):
                scale = jnp.maximum(
                    scale, jnp.max(na[st], axis=0, keepdims=True)
                )
            inv = 1.0 / jnp.where(scale > 0, scale, 1.0)
            for st in range(5):
                sB[st] = nb[st]
                sA[st] = na[st] * inv
            return 0

        lax.fori_loop(0, CH // 2, body, 0)
        return 0

    lax.fori_loop(0, n_chunks, chunk_body, 0)
    out_ref[:, :] = jnp.sum(sA[0], axis=0, keepdims=True)


def main():
    print("devices:", jax.devices(), flush=True)
    f32 = jnp.float32
    run_variant(
        "fori trivial", k_fori_trivial,
        [pltpu.VMEM((1, W, B), f32)],
    )
    run_variant(
        "fori dynread", k_fori_dynread,
        [pltpu.VMEM((1, W, B), f32), pltpu.VMEM((CH, W, B), jnp.int8),
         pltpu.SemaphoreType.DMA(())],
    )
    run_variant(
        "fori realistic x2", k_fori_realistic,
        [pltpu.VMEM((5, W, B), f32), pltpu.VMEM((5, W, B), f32),
         pltpu.VMEM((CH, W, B), jnp.int8), pltpu.SemaphoreType.DMA(())],
    )
    run_variant(
        "fori realistic+dma", k_fori_realistic_dma,
        [pltpu.VMEM((5, W, B), f32), pltpu.VMEM((5, W, B), f32),
         pltpu.VMEM((2, CH, W, B), jnp.int8),
         pltpu.SemaphoreType.DMA((2,))],
    )


if __name__ == "__main__":
    main()
