"""Microbenchmark ladder: isolate the slow feature in the Pallas kernel.

Six kernels share grid=(N,), block (2, W, B) int8 streaming, and add one
feature at a time.  Run on the real TPU; one process, all variants in a
single chip session.
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


def run_variant(name, kernel, extra_scratch=(), n_scalar=0, scalars=()):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((2, W, B), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B), lambda c, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, W, B), jnp.float32)]
        + list(extra_scratch),
    )
    xy = jnp.asarray(
        np.random.default_rng(0).integers(0, 40, (2 * N, W, B), np.int8)
    )

    @functools.partial(jax.jit, static_argnames=())
    def call(*args):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        )(*args)

    args = tuple(scalars) + (xy,)
    t0 = time.time()
    out = np.asarray(call(*args))
    tc = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = np.asarray(call(*args))
        times.append(time.time() - t0)
    best = min(times)
    print("%-22s compile %6.1fs   best %8.4fs   %8.1f ns/gridstep" % (
        name, tc, best, best / N * 1e9), flush=True)
    return out


def k_empty(xy_ref, out_ref, s):
    c = pl.program_id(0)

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        out_ref[:, :] = jnp.zeros((1, B), jnp.float32)


def k_stream(xy_ref, out_ref, s):
    c = pl.program_id(0)
    v = xy_ref[0, :, :].astype(jnp.float32) + xy_ref[1, :, :].astype(
        jnp.float32
    )
    s[0] = s[0] + v

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        out_ref[:, :] = jnp.sum(s[0], axis=0, keepdims=True)


def k_scratch10(xy_ref, out_ref, s):
    c = pl.program_id(0)
    v = xy_ref[0, :, :].astype(jnp.float32)
    acc = v
    for i in range(8):
        prev = s[i]
        s[i] = prev * 0.5 + acc
        acc = acc + prev

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        out_ref[:, :] = jnp.sum(acc, axis=0, keepdims=True)


def k_smem_fma(tf_ref, xy_ref, out_ref, s):
    c = pl.program_id(0)
    xy32 = xy_ref[0, :, :].astype(jnp.int32)
    xv = xy32 >> 3
    yv = xy32 & 7
    oh_x = [(xv == i).astype(jnp.float32) for i in range(5)]
    oh_y = [(yv == i).astype(jnp.float32) for i in range(5)]
    e = jnp.zeros((W, B), jnp.float32)
    for a in range(5):
        inner = jnp.zeros((W, B), jnp.float32)
        for cc in range(5):
            inner = inner + tf_ref[a * 5 + cc] * oh_y[cc]
        e = e + oh_x[a] * inner
    s[0] = s[0] * 0.5 + e

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        out_ref[:, :] = jnp.sum(s[0], axis=0, keepdims=True)


def k_rolls(xy_ref, out_ref, s):
    c = pl.program_id(0)
    row = lax.broadcasted_iota(jnp.int32, (W, B), 0)
    acc = xy_ref[0, :, :].astype(jnp.float32)
    for i in range(8):
        prev = s[i]
        r1 = pltpu.roll(prev, 1, 0)
        r1 = jnp.where(row >= 1, r1, 0.0)
        r2 = pltpu.roll(prev, W - 1, 0)
        r2 = jnp.where(row < W - 1, r2, 0.0)
        s[i] = 0.3 * r1 + 0.3 * r2 + 0.4 * acc
        acc = acc + s[i]

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        out_ref[:, :] = jnp.sum(acc, axis=0, keepdims=True)


def k_dyn_smem(d_ref, xy_ref, out_ref, s):
    c = pl.program_id(0)
    d = d_ref[c]
    v = xy_ref[0, :, :].astype(jnp.float32)
    x = jnp.where(d == 1, v * 2.0, v)
    x = jnp.where(d == 0, x * 0.5, x)
    s[0] = s[0] * 0.5 + x

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        out_ref[:, :] = jnp.sum(s[0], axis=0, keepdims=True)


def main():
    print("devices:", jax.devices(), flush=True)
    tf = jnp.asarray(np.random.default_rng(1).random(25), jnp.float32)
    dd = jnp.asarray(
        np.random.default_rng(2).integers(0, 2, N), jnp.int32
    )
    run_variant("empty", k_empty)
    run_variant("stream int8", k_stream)
    run_variant("scratch rmw x8", k_scratch10)
    run_variant("smem fma (25)", k_smem_fma, n_scalar=1, scalars=(tf,))
    run_variant("rolls x16+mask", k_rolls)
    run_variant("dyn smem select", k_dyn_smem, n_scalar=1, scalars=(dd,))


if __name__ == "__main__":
    main()
