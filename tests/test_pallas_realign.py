"""Pallas fused realign kernel vs the XLA realign_fused (interpret mode).

Interpret mode evaluates the kernel op-by-op in Python, so the sizes
here are tiny and the module's CHUNK/SEG constants are patched down
(this is a fresh-process patch: the jit static cache keys don't include
them, but each pytest process only ever uses one setting).
"""

import numpy as np
import pytest

from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.io.sam import CIG, cigar_to_string
from nanopore_tpu.ops.pairhmm import (
    make_kernel_params,
    prepare_banded_batch,
)
from nanopore_tpu.ops.mea import mea_traceback_fwd, realign_fused
import nanopore_tpu.ops.pairhmm_pallas_realign as ppr
from nanopore_tpu.ops.pairhmm_pallas_realign import (
    dirs_band_from_raw,
    pallas_realign_fused,
)


@pytest.fixture(scope="module", autouse=True)
def small_kernel_geometry():
    old_chunk, old_seg = ppr.CHUNK, ppr.SEG
    ppr.CHUNK = 8
    ppr.SEG = 4
    yield
    ppr.CHUNK, ppr.SEG = old_chunk, old_seg
    # the jit cache keys only on shapes, not CHUNK/SEG: drop entries
    # traced with the small geometry so later same-shape calls in this
    # process retrace with the restored production constants
    ppr._pallas_realign_call.clear_cache()


@pytest.fixture(scope="module")
def params():
    return make_kernel_params(PairHmmModel.default())


def uniform_pairs(rng, B, L, mutate=True):
    pairs = []
    for _ in range(B):
        x = rng.integers(0, 4, L).astype(np.int8)
        y = x.copy()
        if mutate:
            idx = rng.integers(0, L, max(1, L // 10))
            y[idx] = (y[idx] + 1) % 4
        pairs.append((x, y, [(CIG.M, L)]))
    return pairs


class TestPallasRealign:
    def test_matches_xla_fused(self, params):
        rng = np.random.default_rng(7)
        pairs = uniform_pairs(rng, 3, 14)
        batch = prepare_banded_batch(pairs, band_width=8)
        want = realign_fused(batch, params, segment_size=8)
        got = pallas_realign_fused(batch, params, interpret=True)

        np.testing.assert_allclose(
            np.asarray(got["loglik"]), np.asarray(want["loglik"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["score"]), np.asarray(want["score"]),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got["trans"]), np.asarray(want["trans"]),
            rtol=2e-3, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got["emis"]), np.asarray(want["emis"]),
            rtol=2e-3, atol=1e-5,
        )
        offsets = np.asarray(batch.offsets)
        got_dirs = dirs_band_from_raw(
            got["dirs_raw"], len(pairs), batch.k_max
        )
        for b, (x, y, _) in enumerate(pairs):
            m, n = len(y), len(x)
            want_cig = mea_traceback_fwd(
                np.asarray(want["dirs"])[b], offsets[b], m, n
            )
            got_cig = mea_traceback_fwd(got_dirs[b], offsets[b], m, n)
            assert cigar_to_string(got_cig) == cigar_to_string(want_cig)

    def test_with_n_bases_and_indel_guide(self, params):
        """N bases and a guide with a D run (non-straight band)."""
        rng = np.random.default_rng(11)
        L = 16
        pairs = []
        for _ in range(2):
            x = rng.integers(0, 4, L).astype(np.int8)
            y = x[: L - 4].copy()
            y[5] = 4  # N in read
            guide = [(CIG.M, L - 4), (CIG.D, 4)]
            pairs.append((x, y, guide))
        pairs[0][0][3] = 4  # N in ref
        batch = prepare_banded_batch(pairs, band_width=8)
        want = realign_fused(batch, params, segment_size=8)
        got = pallas_realign_fused(batch, params, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got["loglik"]), np.asarray(want["loglik"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["trans"]), np.asarray(want["trans"]),
            rtol=2e-3, atol=1e-5,
        )
        offsets = np.asarray(batch.offsets)
        got_dirs = dirs_band_from_raw(
            got["dirs_raw"], len(pairs), batch.k_max
        )
        for b, (x, y, _) in enumerate(pairs):
            m, n = len(y), len(x)
            cig = mea_traceback_fwd(got_dirs[b], offsets[b], m, n)
            assert sum(l for op, l in cig if op in (CIG.M, CIG.I)) == m
            assert sum(l for op, l in cig if op in (CIG.M, CIG.D)) == n

    def test_mixed_band_geometry(self, params):
        """PER-READ band geometry: every read has its own guide path,
        length and band offsets (the production case — round-1 kernels
        required uniform bands).  Deltas ride bits 6/7 of the packed
        codes; shifts are per-lane blends."""
        rng = np.random.default_rng(17)
        pairs = []
        # read 0: plain match guide, full length
        x0 = rng.integers(0, 4, 18).astype(np.int8)
        pairs.append((x0, x0.copy(), [(CIG.M, 18)]))
        # read 1: shorter, guide with a deletion run (shifted band)
        x1 = rng.integers(0, 4, 16).astype(np.int8)
        y1 = x1[:10].copy()
        pairs.append((x1, y1, [(CIG.M, 5), (CIG.D, 6), (CIG.M, 5)]))
        # read 2: insertion guide (band hugs the other side)
        x2 = rng.integers(0, 4, 10).astype(np.int8)
        y2 = np.concatenate([x2[:5], rng.integers(0, 4, 6).astype(np.int8),
                             x2[5:]])
        pairs.append((x2, y2, [(CIG.M, 5), (CIG.I, 6), (CIG.M, 5)]))
        batch = prepare_banded_batch(pairs, band_width=8)
        offsets = np.asarray(batch.offsets)
        assert not (offsets == offsets[0]).all(), "bands must differ"

        want = realign_fused(batch, params, segment_size=8)
        got = pallas_realign_fused(batch, params, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got["loglik"]), np.asarray(want["loglik"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["score"]), np.asarray(want["score"]),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got["trans"]), np.asarray(want["trans"]),
            rtol=2e-3, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got["emis"]), np.asarray(want["emis"]),
            rtol=2e-3, atol=1e-5,
        )
        got_dirs = dirs_band_from_raw(
            got["dirs_raw"], len(pairs), batch.k_max
        )
        for b, (x, y, _) in enumerate(pairs):
            m, n = len(y), len(x)
            want_cig = mea_traceback_fwd(
                np.asarray(want["dirs"])[b], offsets[b], m, n
            )
            got_cig = mea_traceback_fwd(got_dirs[b], offsets[b], m, n)
            assert cigar_to_string(got_cig) == cigar_to_string(want_cig)

    def test_emit_gamma_matches_forward_backward(self, params):
        """emit_gamma streams the gamma_match band out of phase B; it
        must match the two-pass XLA posterior at every valid pair cell,
        and yc_band must reproduce the host band codes (both feed
        ops.posteriors — the --outputAllPosteriorProbs equivalent)."""
        from nanopore_tpu.ops.pairhmm import forward_backward
        from nanopore_tpu.ops.pairhmm_pallas_realign import (
            PallasRealignPlan,
        )

        rng = np.random.default_rng(29)
        pairs = []
        x0 = rng.integers(0, 4, 14).astype(np.int8)
        y0 = x0.copy()
        y0[rng.integers(0, 14, 3)] = rng.integers(0, 4, 3)
        pairs.append((x0, y0, [(CIG.M, 14)]))
        x1 = rng.integers(0, 4, 12).astype(np.int8)
        pairs.append((x1, x1[:8].copy(), [(CIG.M, 4), (CIG.D, 4), (CIG.M, 4)]))
        batch = prepare_banded_batch(pairs, band_width=8)
        fb = forward_backward(batch, params)
        from nanopore_tpu.ops.pairhmm_pallas_realign import (
            gamma_band_from_raw,
        )

        plan = PallasRealignPlan(batch, params, emit_gamma=True)
        got = plan.run(interpret=True)
        gm_want = np.asarray(fb["gamma_match"])
        gm_got = gamma_band_from_raw(
            got["gamma_raw"], len(pairs), batch.k_max
        )
        offsets = np.asarray(batch.offsets)
        for b, (x, y, _) in enumerate(pairs):
            m, n = len(y), len(x)
            K1 = gm_want.shape[1]
            ks = np.arange(K1)[:, None]
            j = offsets[b][:K1, None] + np.arange(8)[None, :]
            i = ks - j
            valid = (i >= 1) & (i <= m) & (j >= 1) & (j <= n)
            np.testing.assert_allclose(
                gm_got[b][valid], gm_want[b][valid], rtol=1e-3, atol=1e-5
            )
            # yc_band matches the host band codes at every in-lattice
            # cell (the packed stream sentinels out-of-lattice cells the
            # host gather leaves as raw codes; gamma is 0 there, so
            # expectation consumers cannot see the difference)
            yb = np.asarray(plan.yc_band())
            in_lattice = (i >= 0) & (i <= m) & (j >= 0) & (j <= n)
            cell_valid = in_lattice & (i >= 1)
            assert (
                yb[b][cell_valid] == np.asarray(batch.yc)[b][cell_valid]
            ).all()

    def test_emit_em_off_matches_decode_outputs(self, params):
        """emit_em=False (the mapping/realign decode path) must leave
        loglik/score/dirs/gamma identical — it only skips the
        Baum-Welch accumulators."""
        from nanopore_tpu.ops.pairhmm_pallas_realign import (
            PallasRealignPlan,
        )

        rng = np.random.default_rng(31)
        pairs = uniform_pairs(rng, 2, 12)
        batch = prepare_banded_batch(pairs, band_width=8)
        full = PallasRealignPlan(
            batch, params, emit_gamma=True
        ).run(interpret=True)
        lean = PallasRealignPlan(
            batch, params, emit_gamma=True, emit_em=False
        ).run(interpret=True)
        assert "trans" not in lean and "emis" not in lean
        for key in ("loglik", "score"):
            np.testing.assert_allclose(
                np.asarray(lean[key]), np.asarray(full[key]), rtol=1e-6
            )
        assert (
            np.asarray(lean["dirs_raw"]) == np.asarray(full["dirs_raw"])
        ).all()
        np.testing.assert_allclose(
            np.asarray(lean["gamma_raw"]),
            np.asarray(full["gamma_raw"]),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(lean["ll_score"]),
            np.stack(
                [np.asarray(lean["loglik"]), np.asarray(lean["score"])]
            ),
            rtol=0,
        )

    def test_direct_pack_bit_identical(self, params):
        """pack_pallas_pairs (the fused one-pass host pack feeding
        prepared_from_pairs) must produce byte-identical kernel inputs
        to prepare_pallas_realign over a prepare_banded_batch — same
        codes, same band-delta bits, same lane layout."""
        from nanopore_tpu.ops.pairhmm_pallas_realign import (
            pack_pallas_pairs,
            prepare_pallas_realign,
        )

        rng = np.random.default_rng(37)
        pairs = []
        for i in range(5):
            L = int(rng.integers(20, 60))
            x = rng.integers(0, 4, L).astype(np.int8)
            y = x[: L - 6].copy()
            if i % 2:
                y[2] = 4  # N base
            guide = [(CIG.M, L // 2), (CIG.D, 6), (CIG.M, L - 6 - L // 2)]
            pairs.append((x, y, guide))
        batch = prepare_banded_batch(
            pairs, band_width=8, k_max=128, device=False
        )
        want = prepare_pallas_realign(batch, params)
        got = pack_pallas_pairs(pairs, params, band_width=8, k_max=128)
        for key in ("xyc", "kend", "tf", "emf", "egf"):
            assert (np.asarray(want[key]) == np.asarray(got[key])).all(), key
        for key in ("k_pad", "B", "K", "NB", "W"):
            assert want[key] == got[key], key
        assert (got["offsets"] == np.asarray(batch.offsets)).all()
        assert (got["m"] == np.asarray(batch.m)).all()
        assert (got["k_end"] == np.asarray(batch.k_end)).all()

    def test_raw_posterior_consumers_match_band_consumers(self, params):
        """The k-major posterior reductions (rescore_cigars_raw,
        posterior_expectations_raw — the TPU production path) must
        reproduce the per-read band implementations on the same
        interpret-mode gamma stream."""
        from nanopore_tpu.ops.pairhmm_pallas_realign import (
            PallasRealignPlan,
            gamma_band_from_raw,
        )
        from nanopore_tpu.ops.posteriors import (
            posterior_expectations_batch,
            posterior_expectations_raw,
            rescore_cigars,
            rescore_cigars_raw,
        )

        rng = np.random.default_rng(53)
        pairs = []
        x0 = rng.integers(0, 4, 16).astype(np.int8)
        y0 = x0.copy()
        y0[rng.integers(0, 16, 3)] = rng.integers(0, 4, 3)
        pairs.append((x0, y0, [(CIG.M, 16)]))
        x1 = rng.integers(0, 4, 14).astype(np.int8)
        pairs.append((x1, x1[:9].copy(), [(CIG.M, 4), (CIG.D, 5), (CIG.M, 5)]))
        batch = prepare_banded_batch(pairs, band_width=8, device=False)
        plan = PallasRealignPlan(batch, params, emit_gamma=True)
        out = plan.run(interpret=True)
        offsets = np.asarray(batch.offsets)
        ns = np.asarray(batch.n)
        cigars = [g for _, _, g in pairs]

        gm_band = gamma_band_from_raw(
            out["gamma_raw"], len(pairs), batch.k_max
        )
        got_r = rescore_cigars_raw(out["gamma_raw"], offsets, cigars, 8)
        want_r = rescore_cigars(gm_band, offsets, cigars, 8)
        np.testing.assert_allclose(got_r, want_r, rtol=1e-6)

        yc_band = plan.yc_band()
        got_e = posterior_expectations_raw(
            out["gamma_raw"], plan.yc_raw(), offsets, ns, threshold=1e-3
        )
        want_e = posterior_expectations_batch(
            gm_band, yc_band, offsets, ns, threshold=1e-3
        )
        for b in range(len(pairs)):
            np.testing.assert_allclose(
                got_e[b], want_e[b], rtol=1e-5, atol=1e-7
            )

    def test_prepared_em_from_prep_uses_run_params(self, params):
        """PreparedEm built from a direct pack must compute the E-step
        under the RUN-time model, not the scalars embedded at pack time
        (align/em.py builds packs with a default model, then trains)."""
        from nanopore_tpu.ops.dispatch import LitePack, PreparedEm
        from nanopore_tpu.ops.pairhmm_pallas_realign import (
            PallasRealignPlan,
            pack_pallas_pairs,
        )

        rng = np.random.default_rng(47)
        pairs = uniform_pairs(rng, 2, 12)
        params2 = make_kernel_params(
            PairHmmModel.random(np.random.default_rng(6))
        )
        prep = pack_pallas_pairs(pairs, params, band_width=8)
        lite = LitePack(
            offsets=prep["offsets"], m=prep["m"], n=prep["n"],
            k_end=prep["k_end"], band_width=8,
        )
        em = PreparedEm._from_prep(lite, params, prep)
        em._use_pallas = True

        # run under params2 (interpret via the plan it builds)
        from unittest import mock

        orig_run = PallasRealignPlan.run
        with mock.patch.object(
            PallasRealignPlan, "run",
            lambda self: orig_run(self, interpret=True),
        ):
            got = em.run(params2)
        batch = prepare_banded_batch(pairs, band_width=8)
        want = PallasRealignPlan(batch, params2).run(interpret=True)
        np.testing.assert_allclose(
            np.asarray(got["loglik"]), np.asarray(want["loglik"]),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(got["trans"]), np.asarray(want["trans"]),
            rtol=1e-6,
        )

    def test_update_params_matches_fresh_plan(self, params):
        """EM reuse contract (ops.dispatch.PreparedEm): swapping the
        model scalars on an existing plan == building a fresh plan with
        the new model, without re-packing the code tensors."""
        from nanopore_tpu.ops.pairhmm_pallas_realign import (
            PallasRealignPlan,
        )

        rng = np.random.default_rng(23)
        pairs = uniform_pairs(rng, 2, 12)
        batch = prepare_banded_batch(pairs, band_width=8)
        params2 = make_kernel_params(
            PairHmmModel.random(np.random.default_rng(5))
        )

        plan = PallasRealignPlan(batch, params)
        plan.update_params(params2)
        got = plan.run(interpret=True)
        want = PallasRealignPlan(batch, params2).run(interpret=True)
        for key in ("loglik", "score", "trans", "emis"):
            np.testing.assert_allclose(
                np.asarray(got[key]), np.asarray(want[key]), rtol=1e-6
            )
        assert (
            np.asarray(got["dirs_raw"]) == np.asarray(want["dirs_raw"])
        ).all()

    @pytest.mark.skipif(
        not __import__("os").environ.get("NANOPORE_TPU_SLOW_TESTS"),
        reason="interpret-mode eval is ~3 min; set NANOPORE_TPU_SLOW_TESTS=1",
    )
    def test_long_lattice(self, params):
        """K spanning many phase-A DMA chunks and segments (slow)."""
        rng = np.random.default_rng(13)
        pairs = uniform_pairs(rng, 2, 30)
        batch = prepare_banded_batch(pairs, band_width=8)
        want = realign_fused(batch, params, segment_size=8)
        got = pallas_realign_fused(batch, params, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got["loglik"]), np.asarray(want["loglik"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["emis"]), np.asarray(want["emis"]),
            rtol=2e-3, atol=1e-5,
        )


class TestEmitExp:
    def test_fused_retire_matches_oracle_expectations(self, params):
        """emit_exp fuses the SNP expectation retire accumulator into
        phase B (descending); scattering its retired rows + flush must
        reproduce the ascending XLA oracle's per-position matrices
        (posterior_expectations_batch) for every read."""
        from nanopore_tpu.ops.pairhmm import forward_backward
        from nanopore_tpu.ops.pairhmm_pallas_realign import (
            PallasRealignPlan,
        )
        from nanopore_tpu.ops.posteriors import (
            posterior_expectations_batch,
            posterior_expectations_fused,
        )

        rng = np.random.default_rng(31)
        pairs = []
        x0 = rng.integers(0, 4, 16).astype(np.int8)
        y0 = x0.copy()
        y0[rng.integers(0, 16, 4)] = rng.integers(0, 4, 4)
        y0[3] = 4  # N base: must bin nowhere
        pairs.append((x0, y0, [(CIG.M, 16)]))
        x1 = rng.integers(0, 4, 14).astype(np.int8)
        pairs.append(
            (x1, x1[:9].copy(), [(CIG.M, 4), (CIG.D, 5), (CIG.M, 5)])
        )
        x2 = rng.integers(0, 4, 10).astype(np.int8)
        y2 = np.concatenate(
            [x2[:5], rng.integers(0, 4, 4).astype(np.int8), x2[5:]]
        )
        pairs.append((x2, y2, [(CIG.M, 5), (CIG.I, 4), (CIG.M, 5)]))
        batch = prepare_banded_batch(pairs, band_width=8)
        offsets = np.asarray(batch.offsets)
        ns = np.asarray(batch.n)
        fb = forward_backward(batch, params)

        for thr in (0.0, 1e-3):
            want = posterior_expectations_batch(
                fb["gamma_match"], batch.yc, offsets, ns, threshold=thr
            )
            plan = PallasRealignPlan(
                batch, params, emit_em=False, emit_exp=True,
                exp_threshold=thr,
            )
            got_out = plan.run(interpret=True)
            got = posterior_expectations_fused(
                got_out["ret_raw"], got_out["flush_raw"], offsets, ns, 8
            )
            for b in range(len(pairs)):
                np.testing.assert_allclose(
                    got[b], want[b], rtol=1e-3, atol=2e-3
                )


class TestPhaseBPaths:
    """Both phase-B implementations must stay bit-identical: store_fwd
    (phase A streams its forward states to HBM, auto-on for small
    lattices) and the remat fallback (recomputes them, the production
    path past the ~6 GB state budget).  VERDICT r4 #3: the remat branch
    previously had no CI coverage at all."""

    def _mixed_pairs(self, rng):
        pairs = []
        x0 = rng.integers(0, 4, 14).astype(np.int8)
        y0 = x0.copy()
        y0[[2, 7]] = (y0[[2, 7]] + 1) % 4
        pairs.append((x0, y0, [(CIG.M, 14)]))
        x1 = rng.integers(0, 4, 14).astype(np.int8)
        pairs.append(
            (x1, x1[:9].copy(), [(CIG.M, 4), (CIG.D, 5), (CIG.M, 5)])
        )
        x2 = rng.integers(0, 4, 10).astype(np.int8)
        y2 = np.concatenate(
            [x2[:5], rng.integers(0, 4, 4).astype(np.int8), x2[5:]]
        )
        pairs.append((x2, y2, [(CIG.M, 5), (CIG.I, 4), (CIG.M, 5)]))
        return pairs

    @pytest.mark.parametrize(
        "emit", ["em", "decode", "gamma", "exp"]
    )
    def test_store_and_remat_bit_identical(
        self, params, monkeypatch, emit
    ):
        from nanopore_tpu.ops.pairhmm_pallas_realign import (
            PallasRealignPlan,
        )

        rng = np.random.default_rng(23)
        batch = prepare_banded_batch(
            self._mixed_pairs(rng), band_width=8
        )
        outs = {}
        for mode in ("1", "0"):
            monkeypatch.setenv("NANOPORE_TPU_STORE_FWD", mode)
            plan = PallasRealignPlan(
                batch,
                params,
                emit_gamma=(emit == "gamma"),
                emit_em=(emit == "em"),
                emit_exp=(emit == "exp"),
            )
            assert plan.store_fwd == (mode == "1")
            outs[mode] = {
                k: np.asarray(v) for k, v in plan.run(interpret=True).items()
            }
        assert set(outs["1"]) == set(outs["0"])
        for k in outs["1"]:
            if k in ("gamma_raw", "trans", "emis"):
                # the fwd*bwd float accumulators multiply in a
                # different association order between the two paths
                # (loaded vs recomputed forward states) — ulp-level
                # f32 drift on a handful of cells; the discrete
                # outputs (dirs, score, loglik) stay bit-identical
                np.testing.assert_allclose(
                    outs["1"][k], outs["0"][k], rtol=1e-6, atol=1e-12,
                    err_msg="output %r" % k,
                )
            else:
                np.testing.assert_array_equal(
                    outs["1"][k], outs["0"][k], err_msg="output %r" % k
                )

    def test_max_k_fallback_to_xla(self, params, monkeypatch, caplog):
        """k_max past NANOPORE_TPU_PALLAS_MAX_K must fall back to the
        XLA scan (not OOM the chip) and produce the same results."""
        import logging

        from nanopore_tpu.ops.dispatch import (
            PreparedRealign,
            prepared_from_pairs,
        )
        from nanopore_tpu.ops.mea import traceback_cigars_batch

        rng = np.random.default_rng(31)
        pairs = uniform_pairs(rng, 2, 14)
        monkeypatch.setenv("NANOPORE_TPU_KERNEL", "pallas")
        monkeypatch.setenv("NANOPORE_TPU_PALLAS_MAX_K", "8")
        with caplog.at_level(logging.WARNING):
            prep = prepared_from_pairs(
                {}, pairs, params, band_width=8,
                prepared_cls=PreparedRealign,
            )
        assert prep._plan is None, "expected the XLA fallback"
        assert any("pallas kernel skipped" in r.message for r in caplog.records)
        logliks, cigars, _ = prep.decode()

        monkeypatch.delenv("NANOPORE_TPU_KERNEL")
        monkeypatch.delenv("NANOPORE_TPU_PALLAS_MAX_K")
        batch = prepare_banded_batch(pairs, band_width=8)
        want = realign_fused(batch, params, segment_size=8)
        np.testing.assert_allclose(
            logliks, np.asarray(want["loglik"], np.float64), rtol=1e-5
        )
        offsets = np.asarray(batch.offsets)
        for b, (x, y, _) in enumerate(pairs):
            want_cig = mea_traceback_fwd(
                np.asarray(want["dirs"])[b], offsets[b], len(y), len(x)
            )
            assert cigar_to_string(cigars[b]) == cigar_to_string(want_cig)
