"""Pallas Viterbi kernel vs the XLA banded Viterbi (interpret mode).

Same fixture style as test_pallas_realign: tiny shapes, module-patched
CHUNK/SEG, jit cache cleared on teardown.
"""

import numpy as np
import pytest

from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.io.sam import CIG, cigar_to_string
from nanopore_tpu.ops.pairhmm import (
    make_kernel_params,
    prepare_banded_batch,
)
from nanopore_tpu.ops.viterbi import (
    viterbi_decode_batch,
    viterbi_traceback,
)
import nanopore_tpu.ops.pairhmm_pallas_realign as ppr
import nanopore_tpu.ops.pairhmm_pallas_viterbi as ppv
from nanopore_tpu.ops.pairhmm_pallas_viterbi import (
    pallas_viterbi,
    viterbi_traceback_batch,
)


@pytest.fixture(scope="module", autouse=True)
def small_kernel_geometry():
    olds = (ppv.CHUNK, ppv.SEG, ppr.CHUNK, ppr.SEG)
    ppv.CHUNK = 8
    ppv.SEG = 4
    ppr.CHUNK = 8
    ppr.SEG = 4
    yield
    ppv.CHUNK, ppv.SEG, ppr.CHUNK, ppr.SEG = olds
    ppv._pallas_viterbi_call.clear_cache()
    ppr._pallas_realign_call.clear_cache()


@pytest.fixture(scope="module")
def params():
    return make_kernel_params(PairHmmModel.default())


def mixed_pairs(rng):
    pairs = []
    x0 = rng.integers(0, 4, 18).astype(np.int8)
    y0 = x0.copy()
    y0[rng.integers(0, 18, 3)] = rng.integers(0, 4, 3)
    pairs.append((x0, y0, [(CIG.M, 18)]))
    x1 = rng.integers(0, 4, 16).astype(np.int8)
    pairs.append((x1, x1[:10].copy(), [(CIG.M, 5), (CIG.D, 6), (CIG.M, 5)]))
    x2 = rng.integers(0, 4, 10).astype(np.int8)
    y2 = np.concatenate(
        [x2[:5], rng.integers(0, 4, 6).astype(np.int8), x2[5:]]
    )
    pairs.append((x2, y2, [(CIG.M, 5), (CIG.I, 6), (CIG.M, 5)]))
    return pairs


class TestPallasViterbi:
    def test_matches_xla_viterbi(self, params):
        rng = np.random.default_rng(41)
        pairs = mixed_pairs(rng)
        batch = prepare_banded_batch(pairs, band_width=8)
        scores_x, fstates_x, bps_x = viterbi_decode_batch(batch, params)
        got = pallas_viterbi(batch, params, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got["score"]),
            np.asarray(scores_x),
            rtol=1e-5,
            atol=1e-4,
        )
        assert (
            np.asarray(got["fstate"]) == np.asarray(fstates_x)
        ).all()
        offsets = np.asarray(batch.offsets)
        cigars = viterbi_traceback_batch(
            got["bp_raw"], offsets, batch.m, batch.n, got["fstate"]
        )
        bps_x = np.asarray(bps_x)
        for b, (x, y, _) in enumerate(pairs):
            m, n = len(y), len(x)
            want = viterbi_traceback(
                bps_x[b], offsets[b], m, n, int(np.asarray(fstates_x)[b])
            )
            assert cigar_to_string(cigars[b]) == cigar_to_string(want)

    def test_device_traceback_matches_host_on_xla_bp(self, params):
        """The packed-plane device traceback agrees with the host walk
        when fed equivalent backpointers (via the Pallas planes)."""
        rng = np.random.default_rng(43)
        L = 12
        x = rng.integers(0, 4, L).astype(np.int8)
        y = x.copy()
        y[3] = (y[3] + 2) % 4
        batch = prepare_banded_batch([(x, y, [(CIG.M, L)])], band_width=8)
        got = pallas_viterbi(batch, params, interpret=True)
        cigars = viterbi_traceback_batch(
            got["bp_raw"], np.asarray(batch.offsets), batch.m, batch.n,
            got["fstate"],
        )
        m = sum(l for op, l in cigars[0] if op in (CIG.M, CIG.I))
        n = sum(l for op, l in cigars[0] if op in (CIG.M, CIG.D))
        assert (m, n) == (L, L)
