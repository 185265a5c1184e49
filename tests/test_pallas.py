"""Pallas fused forward kernel vs the XLA scan kernel (interpret mode)."""

import numpy as np
import pytest

from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.io.sam import CIG
from nanopore_tpu.ops.pairhmm import (
    make_kernel_params,
    prepare_banded_batch,
    forward_loglik,
)
from nanopore_tpu.ops.pairhmm_pallas import pallas_forward_loglik


@pytest.fixture(scope="module")
def params():
    return make_kernel_params(PairHmmModel.default())


def uniform_pairs(rng, B, L, mutate=True):
    pairs = []
    for _ in range(B):
        x = rng.integers(0, 4, L).astype(np.int8)
        y = x.copy()
        if mutate:
            idx = rng.integers(0, L, max(1, L // 20))
            y[idx] = (y[idx] + 1) % 4
        pairs.append((x, y, [(CIG.M, L)]))
    return pairs


class TestPallasForward:
    def test_matches_xla_kernel(self, params):
        rng = np.random.default_rng(0)
        batch = prepare_banded_batch(
            uniform_pairs(rng, 4, 40), band_width=16
        )
        want = np.asarray(forward_loglik(batch, params))
        got = np.asarray(pallas_forward_loglik(batch, params, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_with_n_bases(self, params):
        rng = np.random.default_rng(1)
        pairs = uniform_pairs(rng, 2, 30)
        pairs[0][0][3] = 4  # N in ref
        pairs[1][1][7] = 4  # N in read
        batch = prepare_banded_batch(pairs, band_width=16)
        want = np.asarray(forward_loglik(batch, params))
        got = np.asarray(pallas_forward_loglik(batch, params, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_multi_chunk(self, params):
        """K spanning several DMA chunks."""
        from nanopore_tpu.ops import pairhmm_pallas

        old_chunk = pairhmm_pallas.CHUNK
        pairhmm_pallas.CHUNK = 32
        try:
            rng = np.random.default_rng(2)
            batch = prepare_banded_batch(
                uniform_pairs(rng, 2, 60), band_width=16
            )
            want = np.asarray(forward_loglik(batch, params))
            got = np.asarray(
                pallas_forward_loglik(batch, params, interpret=True)
            )
            np.testing.assert_allclose(got, want, rtol=1e-5)
        finally:
            pairhmm_pallas.CHUNK = old_chunk

    def test_nonuniform_bands_rejected(self, params):
        rng = np.random.default_rng(3)
        pairs = uniform_pairs(rng, 1, 40) + [
            (
                rng.integers(0, 4, 40).astype(np.int8),
                rng.integers(0, 4, 30).astype(np.int8),
                [(CIG.M, 30), (CIG.D, 10)],
            )
        ]
        batch = prepare_banded_batch(pairs, band_width=16)
        with pytest.raises(ValueError):
            pallas_forward_loglik(batch, params, interpret=True)
