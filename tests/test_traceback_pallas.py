"""On-chip traceback walker vs the XLA scan and the host walk."""

import numpy as np
import pytest

import nanopore_tpu.ops.pairhmm_pallas_realign as ppr
import nanopore_tpu.ops.traceback_pallas as tbp
from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.io.sam import CIG
from nanopore_tpu.ops.pairhmm import (
    make_kernel_params,
    prepare_banded_batch,
)
from nanopore_tpu.ops.mea import mea_traceback_fwd, traceback_cigars_raw
from nanopore_tpu.ops.pairhmm_pallas_realign import (
    PallasRealignPlan,
    dirs_band_from_raw,
)
from nanopore_tpu.ops.traceback_pallas import traceback_cigars_pallas


import nanopore_tpu.ops.pairhmm_pallas_viterbi as ppv


@pytest.fixture(scope="module", autouse=True)
def small_kernel_geometry():
    olds = (ppr.CHUNK, ppr.SEG, tbp.CHUNK, ppv.CHUNK, ppv.SEG)
    ppr.CHUNK = 8
    ppr.SEG = 4
    tbp.CHUNK = 64
    ppv.CHUNK = 8
    ppv.SEG = 4
    yield
    ppr.CHUNK, ppr.SEG, tbp.CHUNK, ppv.CHUNK, ppv.SEG = olds
    ppr._pallas_realign_call.clear_cache()
    tbp._mea_tb_call.clear_cache()
    tbp._vit_tb_call.clear_cache()
    ppv._pallas_viterbi_call.clear_cache()


def test_matches_xla_and_host_walk():
    rng = np.random.default_rng(7)
    params = make_kernel_params(PairHmmModel.default())
    pairs = []
    x0 = rng.integers(0, 4, 16).astype(np.int8)
    y0 = x0.copy()
    y0[3] = (y0[3] + 1) % 4
    pairs.append((x0, y0, [(CIG.M, 16)]))
    x1 = rng.integers(0, 4, 14).astype(np.int8)
    pairs.append((x1, x1[:9].copy(), [(CIG.M, 4), (CIG.D, 5), (CIG.M, 5)]))
    x2 = rng.integers(0, 4, 10).astype(np.int8)
    y2 = np.concatenate(
        [x2[:5], rng.integers(0, 4, 6).astype(np.int8), x2[5:]]
    )
    pairs.append((x2, y2, [(CIG.M, 5), (CIG.I, 6), (CIG.M, 5)]))
    batch = prepare_banded_batch(pairs, band_width=8, device=False)
    plan = PallasRealignPlan(batch, params)
    out = plan.run(interpret=True)
    offsets = np.asarray(batch.offsets)
    ms, ns = np.asarray(batch.m), np.asarray(batch.n)

    got = traceback_cigars_pallas(
        out["dirs_raw"], offsets, ms, ns, interpret=True
    )
    want = traceback_cigars_raw(out["dirs_raw"], offsets, ms, ns)
    bands = dirs_band_from_raw(out["dirs_raw"], len(pairs), batch.k_max)
    for b, (x, y, _) in enumerate(pairs):
        host = mea_traceback_fwd(bands[b], offsets[b], len(y), len(x))
        assert got[b] == want[b] == host


def test_viterbi_walker_matches_xla_walk():
    from nanopore_tpu.ops.pairhmm_pallas_viterbi import (
        pallas_viterbi,
        viterbi_traceback_batch,
    )
    from nanopore_tpu.ops.traceback_pallas import viterbi_cigars_pallas

    rng = np.random.default_rng(41)
    params = make_kernel_params(PairHmmModel.default())
    pairs = []
    x0 = rng.integers(0, 4, 18).astype(np.int8)
    y0 = x0.copy()
    y0[rng.integers(0, 18, 3)] = rng.integers(0, 4, 3)
    pairs.append((x0, y0, [(CIG.M, 18)]))
    x1 = rng.integers(0, 4, 16).astype(np.int8)
    pairs.append((x1, x1[:10].copy(), [(CIG.M, 5), (CIG.D, 6), (CIG.M, 5)]))
    batch = prepare_banded_batch(pairs, band_width=8, device=False)
    out = pallas_viterbi(batch, params, interpret=True)
    offsets = np.asarray(batch.offsets)
    want = viterbi_traceback_batch(
        out["bp_raw"], offsets, batch.m, batch.n, out["fstate"]
    )
    got = viterbi_cigars_pallas(
        out["bp_raw"], offsets, np.asarray(batch.m),
        np.asarray(batch.n), np.asarray(out["fstate"]), interpret=True,
    )
    for b in range(len(pairs)):
        assert got[b] == want[b]
