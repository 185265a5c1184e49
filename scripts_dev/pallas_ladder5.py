"""Ladder 5: isolate the slow DMA / blockspec pattern in the fwd kernel.

Ladder4 cleared the loop body, scratch refs, acc logic and chunked DMA.
Remaining differences vs the production kernel:

  E  xy in HBM as (1, Ktot, W, B) and DMA src .at[bt, pl.ds(...)] with
     bt = program_id (the production pattern)
  F  xy flattened to (Ktot, W, B), src .at[pl.ds(bt*Ktot + off, CHUNK)]
  G  like D but kend/out through (None, 1, B) BlockSpecs w/ index_map
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

from scripts_dev.pallas_ladder4 import make_diag_step  # noqa: E402

W, B = 64, 128
N_SMALL, N_BIG = 2048, 16384
CHUNK = 128


def time_call(call, *args):
    t0 = time.time()
    np.asarray(call(*args))
    tc = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(call(*args))
        times.append(time.time() - t0)
    return min(times), tc


def body_loop(step, n_iter, sA, sB, rs, buf, chunk_dma, n_chunks, zb):
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
            kk = (c * (CHUNK // 2) + ip) * 2
            a = [sA[st] for st in range(5)]
            b = [sB[st] for st in range(5)]
            nb, ls_b, _, acc2 = step(kk + 1, buf[t], a, b, rs[0], ls2,
                                     acc2, False)
            one = jnp.ones((1, B), jnp.float32)
            na, ls_a, inv, acc2 = step(kk + 2, buf[t + 1], nb, a, one,
                                       ls_b, acc2, True)
            for st in range(5):
                sB[st] = nb[st]
                sA[st] = na[st]
            rs[0] = inv
            return (ls_a, acc2)

        return lax.fori_loop(0, CHUNK // 2, pair_body, (ls, acc))

    return lax.fori_loop(0, n_chunks, chunk_body, (zb, zb))


def mk_E(n_iter):
    def k(d1_ref, tf_ref, emf_ref, egf_ref, kend_ref, xy_hbm, out_ref,
          sA, sB, rs, buf, sems):
        bt = pl.program_id(0)
        row = lax.broadcasted_iota(jnp.int32, (W, B), 0)
        zeros = jnp.zeros((W, B), jnp.float32)
        zb = jnp.zeros((1, B), jnp.float32)
        kend = kend_ref[:, :]
        step = make_diag_step(d1_ref, tf_ref, emf_ref, egf_ref, row,
                              zeros, zb, kend)
        n_chunks = n_iter // CHUNK

        def chunk_dma(c, slot):
            src = lax.rem(c * CHUNK, 2048)
            return pltpu.make_async_copy(
                xy_hbm.at[bt, pl.ds(src, CHUNK)],
                buf.at[pl.ds(slot * CHUNK, CHUNK)],
                sems.at[slot],
            )

        chunk_dma(0, 0).start()
        ls, acc = body_loop(step, n_iter, sA, sB, rs, buf, chunk_dma,
                            n_chunks, zb)
        out_ref[:, :] = acc + ls
    return k


def mk_F(n_iter):
    def k(d1_ref, tf_ref, emf_ref, egf_ref, kend_ref, xy_hbm, out_ref,
          sA, sB, rs, buf, sems):
        bt = pl.program_id(0)
        row = lax.broadcasted_iota(jnp.int32, (W, B), 0)
        zeros = jnp.zeros((W, B), jnp.float32)
        zb = jnp.zeros((1, B), jnp.float32)
        kend = kend_ref[:, :]
        step = make_diag_step(d1_ref, tf_ref, emf_ref, egf_ref, row,
                              zeros, zb, kend)
        n_chunks = n_iter // CHUNK

        def chunk_dma(c, slot):
            src = bt * 2048 + lax.rem(c * CHUNK, 2048)
            return pltpu.make_async_copy(
                xy_hbm.at[pl.ds(src, CHUNK)],
                buf.at[pl.ds(slot * CHUNK, CHUNK)],
                sems.at[slot],
            )

        chunk_dma(0, 0).start()
        ls, acc = body_loop(step, n_iter, sA, sB, rs, buf, chunk_dma,
                            n_chunks, zb)
        out_ref[:, :] = acc + ls
    return k


def run(name, make_kernel, xy_shape, blockspec_io=False):
    results = []
    for n_iter in (N_SMALL, N_BIG):
        kernel = make_kernel(n_iter)
        if blockspec_io:
            in_specs = [
                pl.BlockSpec((None, 1, B), lambda bt, *_: (bt, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
            out_specs = pl.BlockSpec((None, 1, B),
                                     lambda bt, *_: (bt, 0, 0),
                                     memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((1, 1, B), jnp.float32)
            kend = jnp.full((1, 1, B), 9_999, jnp.int32)
        else:
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
            out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((1, B), jnp.float32)
            kend = jnp.full((1, B), 9_999, jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(1,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((5, W, B), jnp.float32),
                pltpu.VMEM((5, W, B), jnp.float32),
                pltpu.VMEM((1, 1, B), jnp.float32),
                pltpu.VMEM((2 * CHUNK, W, B), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        xy = jnp.asarray(
            np.random.default_rng(0).integers(0, 40, xy_shape, np.int8)
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
                kernel, grid_spec=grid_spec, out_shape=out_shape,
            )(*a)

        call = jax.jit(call)
        t, tc = time_call(call, *(scalars + (kend, xy)))
        results.append((t, tc))
    (t1, c1), (t2, c2) = results
    marginal = (t2 - t1) / (N_BIG - N_SMALL) * 1e9
    print("%-34s small %8.4fs  big %8.4fs  marginal %9.1f ns/iter "
          "(compiles %.0fs/%.0fs)" % (name, t1, t2, marginal, c1, c2),
          flush=True)


def mk_G(n_iter):
    def k(d1_ref, tf_ref, emf_ref, egf_ref, kend_ref, xy_hbm, out_ref,
          sA, sB, rs, buf, sems):
        row = lax.broadcasted_iota(jnp.int32, (W, B), 0)
        zeros = jnp.zeros((W, B), jnp.float32)
        zb = jnp.zeros((1, B), jnp.float32)
        kend = kend_ref[:, :]
        step = make_diag_step(d1_ref, tf_ref, emf_ref, egf_ref, row,
                              zeros, zb, kend)
        n_chunks = n_iter // CHUNK

        def chunk_dma(c, slot):
            src = lax.rem(c * CHUNK, 2048)
            return pltpu.make_async_copy(
                xy_hbm.at[pl.ds(src, CHUNK)],
                buf.at[pl.ds(slot * CHUNK, CHUNK)],
                sems.at[slot],
            )

        chunk_dma(0, 0).start()
        ls, acc = body_loop(step, n_iter, sA, sB, rs, buf, chunk_dma,
                            n_chunks, zb)
        out_ref[:, :] = acc + ls
    return k


def main():
    print("devices:", jax.devices(), flush=True)
    run("E .at[bt, ds(...)] 4-D HBM src", mk_E, (1, 2048, W, B))
    run("F flattened 3-D HBM src", mk_F, (2048, W, B))
    run("G + (None,1,B) BlockSpec io", mk_G, (2048, W, B),
        blockspec_io=True)


if __name__ == "__main__":
    main()
