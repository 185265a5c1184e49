"""prepared_from_pairs plumbing: LitePack path and XLA fallback."""

import numpy as np
import pytest
from unittest import mock

import nanopore_tpu.ops.pairhmm_pallas_realign as ppr
import nanopore_tpu.ops.traceback_pallas as tbp
from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.io.sam import CIG
from nanopore_tpu.ops.pairhmm import (
    make_kernel_params,
    prepare_banded_batch,
)
from nanopore_tpu.ops import dispatch


@pytest.fixture(scope="module", autouse=True)
def small_kernel_geometry():
    olds = (ppr.CHUNK, ppr.SEG, tbp.CHUNK)
    ppr.CHUNK = 8
    ppr.SEG = 4
    tbp.CHUNK = 64
    yield
    ppr.CHUNK, ppr.SEG, tbp.CHUNK = olds
    ppr._pallas_realign_call.clear_cache()
    tbp._mea_tb_call.clear_cache()


def _pairs(rng):
    pairs = []
    x0 = rng.integers(0, 4, 16).astype(np.int8)
    y0 = x0.copy()
    y0[2] = (y0[2] + 1) % 4
    pairs.append((x0, y0, [(CIG.M, 16)]))
    x1 = rng.integers(0, 4, 14).astype(np.int8)
    pairs.append((x1, x1[:9].copy(), [(CIG.M, 4), (CIG.D, 5), (CIG.M, 5)]))
    return pairs


def test_litepack_pallas_route_decodes_like_xla(monkeypatch):
    """Forced-pallas prepared_from_pairs (interpret mode) must produce
    the same logliks/cigars as the default XLA route — covers the
    LitePack metadata, _from_prep plumbing, raw dirs layout and the
    on-chip walker end to end."""
    monkeypatch.setenv("NANOPORE_TPU_PACK", "host")  # host-pack route
    rng = np.random.default_rng(61)
    params = make_kernel_params(PairHmmModel.default())
    pairs = _pairs(rng)

    want = dispatch.prepared_from_pairs(
        {}, pairs, params, band_width=8, prepared_cls=dispatch.PreparedRealign
    )
    want_ll, want_cigs, _ = want.decode()

    orig_run = ppr.PallasRealignPlan.run
    orig_tb = tbp._mea_tb_call

    def interp_tb(mn, dirs_raw, offs, k1_pad, NB, W, interpret=False):
        return orig_tb(mn, dirs_raw, offs, k1_pad, NB, W, True)

    with mock.patch.object(dispatch, "kernel_choice", lambda: "pallas"), \
         mock.patch.object(
             dispatch, "_PALLAS_BAND_WIDTHS", (8, 32, 64)
         ), \
         mock.patch.object(
             ppr.PallasRealignPlan, "run",
             lambda self: orig_run(self, interpret=True),
         ), \
         mock.patch.object(tbp, "_mea_tb_call", interp_tb):
        got = dispatch.prepared_from_pairs(
            {},
            pairs,
            params,
            band_width=8,
            prepared_cls=dispatch.PreparedRealign,
        )
        assert isinstance(got.batch, dispatch.LitePack)
        got_ll, got_cigs, _ = got.decode()

    np.testing.assert_allclose(got_ll, want_ll, rtol=1e-4)
    for b in range(len(pairs)):
        assert got_cigs[b] == want_cigs[b]


def test_pallas_backend_odd_band_width_falls_back_to_xla():
    """band_width outside _PALLAS_BAND_WIDTHS on a pallas backend must
    take the XLA BandedBatch route and still decode."""
    rng = np.random.default_rng(67)
    params = make_kernel_params(PairHmmModel.default())
    pairs = _pairs(rng)
    with mock.patch.object(dispatch, "kernel_choice", lambda: "pallas"):
        prep = dispatch.prepared_from_pairs(
            {},
            pairs,
            params,
            band_width=24,
            prepared_cls=dispatch.PreparedRealign,
        )
        assert prep._plan is None  # XLA fallback
        ll, cigs, _ = prep.decode()
    assert np.isfinite(ll).all()
    for b, (x, y, _) in enumerate(pairs):
        m = sum(l for op, l in cigs[b] if op in (CIG.M, CIG.I))
        n = sum(l for op, l in cigs[b] if op in (CIG.M, CIG.D))
        assert (m, n) == (len(y), len(x))

def test_streampack_pallas_route_decodes_like_xla(monkeypatch):
    """Forced-pallas prepared_from_pairs with the ON-DEVICE packer
    (stream pack, interpret mode) must match the XLA route end to end
    — covers ops.pack_pallas host streaming, the packer kernel, and
    its hand-off into PallasRealignPlan."""
    import nanopore_tpu.ops.pack_pallas as pkp

    monkeypatch.setenv("NANOPORE_TPU_PACK", "stream")
    monkeypatch.setenv("NANOPORE_TPU_PACK_INTERPRET", "1")
    monkeypatch.setattr(pkp, "CHUNK", 8)
    monkeypatch.setattr(pkp, "SEG", 8)
    rng = np.random.default_rng(61)
    params = make_kernel_params(PairHmmModel.default())
    pairs = _pairs(rng)

    want = dispatch.prepared_from_pairs(
        {}, pairs, params, band_width=8, prepared_cls=dispatch.PreparedRealign
    )
    want_ll, want_cigs, _ = want.decode()

    orig_run = ppr.PallasRealignPlan.run
    orig_tb = tbp._mea_tb_call

    def interp_tb(mn, dirs_raw, offs, k1_pad, NB, W, interpret=False):
        return orig_tb(mn, dirs_raw, offs, k1_pad, NB, W, True)

    with mock.patch.object(dispatch, "kernel_choice", lambda: "pallas"), \
         mock.patch.object(
             dispatch, "_PALLAS_BAND_WIDTHS", (8, 32, 64)
         ), \
         mock.patch.object(
             ppr.PallasRealignPlan, "run",
             lambda self: orig_run(self, interpret=True),
         ), \
         mock.patch.object(tbp, "_mea_tb_call", interp_tb):
        got = dispatch.prepared_from_pairs(
            {},
            pairs,
            params,
            band_width=8,
            prepared_cls=dispatch.PreparedRealign,
        )
        assert isinstance(got.batch, dispatch.LitePack)
        got_ll, got_cigs, _ = got.decode()
    pkp._pack_call.clear_cache()

    np.testing.assert_allclose(got_ll, want_ll, rtol=1e-4)
    for b in range(len(pairs)):
        assert got_cigs[b] == want_cigs[b]


def test_streampack_multi_tile_decode(monkeypatch):
    """B > 128 (two lane tiles): the stream pack, the realign kernel's
    2-program grid and the MEA walker must all place/consume lanes
    correctly — guards the non-contiguous lane-assignment bug class
    (arr[:, i].reshape(-1)[:B] = v silently no-ops at NB > 1)."""
    import nanopore_tpu.ops.pack_pallas as pkp

    monkeypatch.setenv("NANOPORE_TPU_PACK", "stream")
    monkeypatch.setenv("NANOPORE_TPU_PACK_INTERPRET", "1")
    monkeypatch.setattr(pkp, "CHUNK", 8)
    monkeypatch.setattr(pkp, "SEG", 8)
    rng = np.random.default_rng(71)
    params = make_kernel_params(PairHmmModel.default())
    base = _pairs(rng)
    # 130 candidates: tile 1 holds reads 128/129
    pairs = [base[i % len(base)] for i in range(130)]

    want = dispatch.prepared_from_pairs(
        {}, pairs, params, band_width=8,
        prepared_cls=dispatch.PreparedRealign,
    )
    want_ll, want_cigs, _ = want.decode()

    orig_run = ppr.PallasRealignPlan.run
    orig_tb = tbp._mea_tb_call

    def interp_tb(mn, dirs_raw, offs, k1_pad, NB, W, interpret=False):
        return orig_tb(mn, dirs_raw, offs, k1_pad, NB, W, True)

    with mock.patch.object(dispatch, "kernel_choice", lambda: "pallas"), \
         mock.patch.object(
             dispatch, "_PALLAS_BAND_WIDTHS", (8, 32, 64)
         ), \
         mock.patch.object(
             ppr.PallasRealignPlan, "run",
             lambda self: orig_run(self, interpret=True),
         ), \
         mock.patch.object(tbp, "_mea_tb_call", interp_tb):
        got = dispatch.prepared_from_pairs(
            {},
            pairs,
            params,
            band_width=8,
            prepared_cls=dispatch.PreparedRealign,
        )
        got_ll, got_cigs, _ = got.decode()
    pkp._pack_call.clear_cache()

    np.testing.assert_allclose(got_ll, want_ll, rtol=1e-4)
    for b in (0, 1, 127, 128, 129):
        assert got_cigs[b] == want_cigs[b]


def test_pallas_k_budget_falls_back_to_xla(monkeypatch):
    """Batches whose diagonal count exceeds the Pallas HBM stream
    budget must take the XLA BandedBatch route instead of OOMing."""
    monkeypatch.setenv("NANOPORE_TPU_PALLAS_MAX_K", "16")
    rng = np.random.default_rng(3)
    params = make_kernel_params(PairHmmModel.default())
    pairs = _pairs(rng)  # k need ~30 > 16
    with mock.patch.object(dispatch, "kernel_choice", lambda: "pallas"), \
         mock.patch.object(dispatch, "_PALLAS_BAND_WIDTHS", (8,)):
        prep = dispatch.prepared_from_pairs(
            {}, pairs, params, band_width=8,
            prepared_cls=dispatch.PreparedRealign,
        )
    assert prep._plan is None  # XLA fallback
    ll, cigs, _ = prep.decode()
    assert np.isfinite(ll).all() and len(cigs) == len(pairs)
