"""Tests for the mesh/sharding layer and the driver entry points."""

import numpy as np
import pytest
import jax

from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.io.sam import CIG
from nanopore_tpu.ops.pairhmm import (
    prepare_banded_batch,
    make_kernel_params,
    kernel_tables,
    forward_loglik,
)
from nanopore_tpu.parallel.mesh import make_mesh, DP_AXIS, TRIAL_AXIS
from nanopore_tpu.parallel.sharded_em import sharded_em_train, em_train_step


def make_pairs(rng, count, length):
    pairs = []
    for _ in range(count):
        x = rng.integers(0, 4, length).astype(np.int8)
        keep = rng.random(length) > 0.05
        y = x[keep]
        d = min(len(y), length)
        guide = [(CIG.M, d)]
        if length > d:
            guide.append((CIG.D, length - d))
        pairs.append((x, y, guide))
    return pairs


class TestMesh:
    def test_mesh_shapes(self):
        mesh = make_mesh(n_devices=8, n_trials=2)
        assert mesh.shape[DP_AXIS] == 4
        assert mesh.shape[TRIAL_AXIS] == 2
        mesh = make_mesh(n_devices=8, n_trials=3)
        assert mesh.shape[TRIAL_AXIS] == 2  # largest divisor <= 3
        mesh = make_mesh(n_devices=7, n_trials=3)
        assert mesh.shape[TRIAL_AXIS] == 1
        assert mesh.shape[DP_AXIS] == 7

    def test_kernel_tables_matches_host(self):
        model = PairHmmModel.default()
        host = make_kernel_params(model)
        dev = kernel_tables(
            np.asarray(model.transitions, np.float32),
            np.asarray(model.emissions, np.float32),
        )
        np.testing.assert_allclose(np.asarray(dev.t), np.asarray(host.t))
        np.testing.assert_allclose(
            np.asarray(dev.e_match_flat), np.asarray(host.e_match_flat),
            atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(dev.e_gap_flat), np.asarray(host.e_gap_flat),
            atol=1e-7,
        )


class TestShardedEm:
    def test_em_step_shapes(self):
        rng = np.random.default_rng(0)
        batch = prepare_banded_batch(
            make_pairs(rng, 4, 60), band_width=16
        )
        models = [PairHmmModel.random(rng) for _ in range(2)]
        t = np.stack([m.transitions for m in models]).astype(np.float32)
        e = np.stack([m.emissions for m in models]).astype(np.float32)
        w = np.ones(4, np.float32)
        new_t, new_e, ll = em_train_step(
            t, e, batch.xc, batch.yc, batch.xn, batch.yn, batch.offsets,
            batch.m, batch.n, batch.k_end, w, 16,
        )
        assert new_t.shape == (2, 5, 5)
        assert new_e.shape == (2, 5, 16)
        np.testing.assert_allclose(
            np.asarray(new_t).sum(axis=-1), 1.0, atol=1e-5
        )
        assert np.isfinite(np.asarray(ll)).all()

    def test_sharded_em_improves_likelihood(self):
        rng = np.random.default_rng(1)
        mesh = make_mesh(n_devices=8, n_trials=2)
        batch = prepare_banded_batch(
            make_pairs(rng, 8, 80), band_width=24
        )
        model, trial_models, traces = sharded_em_train(
            batch, mesh, trials=2, iterations=6, seed=3
        )
        for trace in traces:
            assert trace[-1] > trace[0]
        assert len(trial_models) == 2
        assert model.likelihood == max(m.likelihood for m in trial_models)
        np.testing.assert_allclose(
            model.transitions.sum(axis=1), 1.0, atol=1e-5
        )

    def test_padding_weights_ignored(self):
        """Zero-weight padding rows must not change expectations."""
        rng = np.random.default_rng(2)
        pairs = make_pairs(rng, 2, 50)
        batch2 = prepare_banded_batch(pairs, band_width=16)
        batch4 = prepare_banded_batch(pairs + pairs, band_width=16)
        model = PairHmmModel.default()
        t = np.stack([model.transitions]).astype(np.float32)
        e = np.stack([model.emissions]).astype(np.float32)
        w2 = np.ones(2, np.float32)
        w4 = np.array([1, 1, 0, 0], np.float32)
        _, _, ll2 = em_train_step(
            t, e, batch2.xc, batch2.yc, batch2.xn, batch2.yn,
            batch2.offsets, batch2.m, batch2.n, batch2.k_end, w2, 16,
        )
        _, _, ll4 = em_train_step(
            t, e, batch4.xc, batch4.yc, batch4.xn, batch4.yn,
            batch4.offsets, batch4.m, batch4.n, batch4.k_end, w4, 16,
        )
        np.testing.assert_allclose(
            np.asarray(ll2), np.asarray(ll4), rtol=1e-5
        )


class TestShardedEmPallas:
    def test_pallas_step_matches_xla_step(self):
        """The Pallas E-step under shard_map (interpret mode) must
        reproduce the XLA em_train_step's M-step outputs on a (dp=4,
        trial=2) mesh — the pod-scale EM route (VERDICT r2 #5)."""
        import nanopore_tpu.ops.pairhmm_pallas_realign as ppr
        from nanopore_tpu.parallel.sharded_em import (
            make_sharded_em_step,
            make_sharded_em_step_pallas,
        )

        old_chunk, old_seg = ppr.CHUNK, ppr.SEG
        ppr.CHUNK = 8
        ppr.SEG = 4
        try:
            rng = np.random.default_rng(9)
            mesh = make_mesh(n_devices=8, n_trials=2)
            pairs = make_pairs(rng, 6, 16)
            # pad B to the dp axis (4) for the XLA step; zero weights
            # keep the padding rows out of the expectations
            pairs = pairs + pairs[:2]
            batch = prepare_banded_batch(pairs, band_width=8)
            w = np.array([1] * 6 + [0] * 2, np.float32)
            models = [PairHmmModel.random(rng) for _ in range(2)]
            t = np.stack([m.transitions for m in models]).astype(
                np.float32
            )
            e = np.stack([m.emissions for m in models]).astype(np.float32)

            step_p = make_sharded_em_step_pallas(
                mesh, batch, w, interpret=True
            )
            got_t, got_e, got_ll = step_p((t, e))

            step_x = make_sharded_em_step(mesh, batch.band_width)
            want_t, want_e, want_ll = step_x(
                (t, e),
                (
                    batch.xc, batch.yc, batch.xn, batch.yn,
                    batch.offsets, batch.m, batch.n, batch.k_end, w,
                ),
            )
            np.testing.assert_allclose(
                np.asarray(got_ll), np.asarray(want_ll), rtol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(got_t), np.asarray(want_t), rtol=2e-3,
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(got_e), np.asarray(want_e), rtol=2e-3,
                atol=1e-5,
            )
        finally:
            ppr.CHUNK, ppr.SEG = old_chunk, old_seg
            ppr._pallas_realign_call.clear_cache()


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys, pathlib

        sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
        import __graft_entry__ as graft

        fn, args = graft.entry()
        out = jax.jit(fn)(*args)
        out = np.asarray(out)
        assert out.shape == (4,)
        assert np.isfinite(out).all()

    def test_dryrun_multichip(self):
        import __graft_entry__ as graft

        graft.dryrun_multichip(8)
