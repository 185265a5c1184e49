"""Device-side posterior-band consumers vs the host oracles.

ops.posteriors serves the reference's posterior outputs
(--rescoreByPosteriorProbIgnoringGaps / --outputAllPosteriorProbs,
reference analyses/alignmentUncertainty.py:41-42,
marginAlignSnpCaller.py:136-155) as on-device reductions; these tests
pin them to the per-cell host implementations
(ops.mea.rescore_by_posterior, ops.pairhmm.extract_posterior_pairs).
"""

import numpy as np
import pytest

from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.io.sam import CIG
from nanopore_tpu.ops.mea import rescore_by_posterior
from nanopore_tpu.ops.pairhmm import (
    extract_posterior_pairs,
    forward_backward,
    make_kernel_params,
    prepare_banded_batch,
)
from nanopore_tpu.ops.posteriors import (
    posterior_expectations_batch,
    rescore_cigars,
)

W = 8


@pytest.fixture(scope="module")
def fb_case():
    rng = np.random.default_rng(3)
    params = make_kernel_params(PairHmmModel.default())
    pairs = []
    # mixed band geometries: matches, a deletion guide, an insertion guide
    x0 = rng.integers(0, 4, 20).astype(np.int8)
    y0 = x0.copy()
    y0[rng.integers(0, 20, 4)] = rng.integers(0, 4, 4)
    pairs.append((x0, y0, [(CIG.M, 20)]))
    x1 = rng.integers(0, 4, 18).astype(np.int8)
    pairs.append((x1, x1[:12].copy(), [(CIG.M, 6), (CIG.D, 6), (CIG.M, 6)]))
    x2 = rng.integers(0, 4, 12).astype(np.int8)
    y2 = np.concatenate(
        [x2[:6], rng.integers(0, 4, 5).astype(np.int8), x2[6:]]
    )
    y2[2] = 4  # N base: must not contribute to expectations
    pairs.append((x2, y2, [(CIG.M, 6), (CIG.I, 5), (CIG.M, 6)]))
    batch = prepare_banded_batch(pairs, band_width=W)
    fb = forward_backward(batch, params)
    return pairs, batch, fb


class TestRescore:
    def test_matches_host_rescore(self, fb_case):
        pairs, batch, fb = fb_case
        gm = np.asarray(fb["gamma_match"])
        offs = np.asarray(batch.offsets)
        cigars = [guide for _, _, guide in pairs]
        got = rescore_cigars(fb["gamma_match"], offs, cigars, W)
        for b, (x, y, guide) in enumerate(pairs):
            want = rescore_by_posterior(gm[b], offs[b], guide)
            assert got[b] == pytest.approx(want, rel=1e-6)

    def test_off_band_pairs_counted(self):
        """Pairs outside the band add 0 posterior but still divide."""
        gm = np.zeros((1, 7, 4), np.float32)
        gm[0, 2, 1] = 0.5  # pair (0,0) at k=2, j=1, offset 0 -> b=1
        offsets = np.zeros((1, 7), np.int32)
        # cigar with 3 M: pairs at k=2,4,6 -> b = j - 0 = 1, 2, 3
        got = rescore_cigars(gm, offsets, [[(CIG.M, 3)]], 4)
        want = rescore_by_posterior(gm[0], offsets[0], [(CIG.M, 3)])
        assert got[0] == pytest.approx(want)
        assert got[0] == pytest.approx(0.5 / 3)


class TestExpectations:
    def test_matches_extract_accumulation(self, fb_case):
        pairs, batch, fb = fb_case
        gm = np.asarray(fb["gamma_match"])
        offs = np.asarray(batch.offsets)
        ns = np.asarray(batch.n)
        got = posterior_expectations_batch(
            fb["gamma_match"], batch.yc, offs, ns, threshold=1e-3
        )
        for b, (x, y, _) in enumerate(pairs):
            m, n = len(y), len(x)
            read_idx, ref_idx, probs = extract_posterior_pairs(
                gm[b], offs[b], m, n, 1e-3
            )
            want = np.zeros((n, 4))
            rb = np.asarray(y)[read_idx]
            ok = rb < 4
            np.add.at(want, (ref_idx[ok], rb[ok]), probs[ok])
            np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-7)

    def test_zero_threshold_mass_conservation(self, fb_case):
        """With no threshold, total expectation mass == total gamma mass
        over valid non-N pairs."""
        pairs, batch, fb = fb_case
        gm = np.asarray(fb["gamma_match"])
        offs = np.asarray(batch.offsets)
        ns = np.asarray(batch.n)
        got = posterior_expectations_batch(
            fb["gamma_match"], batch.yc, offs, ns, threshold=0.0
        )
        for b, (x, y, _) in enumerate(pairs):
            m, n = len(y), len(x)
            read_idx, ref_idx, probs = extract_posterior_pairs(
                gm[b], offs[b], m, n, 0.0
            )
            ok = np.asarray(y)[read_idx] < 4
            assert got[b].sum() == pytest.approx(probs[ok].sum(), rel=1e-5)


class TestPreparedPosteriors:
    def test_xla_route(self, fb_case):
        from nanopore_tpu.ops.dispatch import PreparedPosteriors

        pairs, batch, fb = fb_case
        params = make_kernel_params(PairHmmModel.default())
        out = PreparedPosteriors(batch, params).run()
        np.testing.assert_allclose(
            np.asarray(out["gamma_match"]),
            np.asarray(fb["gamma_match"]),
            rtol=1e-6,
        )
        assert (np.asarray(out["yc"]) == np.asarray(batch.yc)).all()
        np.testing.assert_allclose(
            np.asarray(out["loglik"]), np.asarray(fb["loglik"]), rtol=1e-6
        )


class TestGammaFailSafe:
    """TPU backends must never silently consume the XLA forward_backward
    gamma bands (known-miscompiled there, scripts_dev/gamma_probe.py):
    the fail-safe raises with a repack instruction instead."""

    def _fake_tpu(self, monkeypatch):
        import jax

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def test_forward_backward_refuses_on_tpu(self, fb_case, monkeypatch):
        _, batch, _ = fb_case
        self._fake_tpu(monkeypatch)
        params = make_kernel_params(PairHmmModel.default())
        with pytest.raises(RuntimeError, match="gamma"):
            forward_backward(batch, params)

    def test_forward_backward_escape_hatch(self, fb_case, monkeypatch):
        _, batch, _ = fb_case
        self._fake_tpu(monkeypatch)
        monkeypatch.setenv("NANOPORE_TPU_ALLOW_TPU_GAMMA", "1")
        params = make_kernel_params(PairHmmModel.default())
        out = forward_backward(batch, params)  # probes may opt in
        assert "gamma_match" in out

    def test_prepared_posteriors_refuses_ineligible_band_on_tpu(
        self, fb_case, monkeypatch
    ):
        from nanopore_tpu.ops.dispatch import PreparedPosteriors

        _, batch, _ = fb_case  # W=8: not a Pallas-served band width
        self._fake_tpu(monkeypatch)
        params = make_kernel_params(PairHmmModel.default())
        with pytest.raises(RuntimeError, match="band_width"):
            PreparedPosteriors(batch, params)

    def test_realign_rescore_refuses_odd_band_on_tpu(self, monkeypatch):
        from nanopore_tpu.align.realign import realign_records
        from nanopore_tpu.io.sam import SamRecord

        self._fake_tpu(monkeypatch)
        # force the XLA kernel so the rescore path would consume
        # forward_backward gammas — must refuse, not warn
        monkeypatch.setenv("NANOPORE_TPU_KERNEL", "xla")
        rec = SamRecord(
            qname="r", flag=0, rname="ref", pos=0, mapq=0,
            cigar=[(CIG.M, 4)], seq="ACGT", qual="*",
        )
        with pytest.raises(RuntimeError, match="gamma"):
            realign_records(
                [rec], {"ref": "ACGT"}, rescore=True, band_width=8
            )
