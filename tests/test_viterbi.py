"""Banded Viterbi decode vs the unbanded NumPy max-product oracle."""

import numpy as np
import pytest

from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.io.sam import CIG, cigar_to_string
from nanopore_tpu.ops import pairhmm_ref as oracle
from nanopore_tpu.ops.pairhmm import make_kernel_params, prepare_banded_batch
from nanopore_tpu.ops.viterbi import viterbi_decode_batch, viterbi_traceback

from tests.test_pairhmm import simulate_pair, diagonal_guide


@pytest.fixture(scope="module")
def model():
    return PairHmmModel.default()


@pytest.fixture(scope="module")
def params(model):
    return make_kernel_params(model)


@pytest.fixture(scope="module")
def oracle_params(model):
    return oracle.PairHmmParams.from_model(model)


def _cigar_len_check(cigar, m, n):
    read_len = sum(l for op, l in cigar if op in (CIG.M, CIG.I))
    ref_len = sum(l for op, l in cigar if op in (CIG.M, CIG.D))
    assert read_len == m and ref_len == n


class TestViterbi:
    def test_matches_oracle_full_band(self, model, params, oracle_params):
        """Band covering the whole lattice must reproduce unbanded Viterbi."""
        rng = np.random.default_rng(7)
        for trial in range(6):
            x, y = simulate_pair(rng, model, length=10 + trial)
            W = len(x) + 2  # full ref coverage on every diagonal
            batch = prepare_banded_batch(
                [(x, y, diagonal_guide(len(y), len(x)))], band_width=W
            )
            scores, fstates, bps = viterbi_decode_batch(batch, params)
            got_score = float(scores[0])
            got_cigar = viterbi_traceback(
                np.asarray(bps)[0], np.asarray(batch.offsets)[0],
                len(y), len(x), int(fstates[0]),
            )
            want_score, want_cigar = oracle.viterbi_full(x, y, oracle_params)
            assert got_score == pytest.approx(want_score, abs=1e-3)
            _cigar_len_check(got_cigar, len(y), len(x))
            assert cigar_to_string(got_cigar) == cigar_to_string(want_cigar)

    def test_narrow_band_score_bounded(self, model, params, oracle_params):
        """A narrow band restricts paths: score <= unbanded optimum and the
        cigar still spans both sequences."""
        rng = np.random.default_rng(3)
        x, y = simulate_pair(rng, model, length=40)
        batch = prepare_banded_batch(
            [(x, y, diagonal_guide(len(y), len(x)))], band_width=8
        )
        scores, fstates, bps = viterbi_decode_batch(batch, params)
        want_score, _ = oracle.viterbi_full(x, y, oracle_params)
        assert float(scores[0]) <= want_score + 1e-3
        cigar = viterbi_traceback(
            np.asarray(bps)[0], np.asarray(batch.offsets)[0],
            len(y), len(x), int(fstates[0]),
        )
        _cigar_len_check(cigar, len(y), len(x))

    def test_batched_mixed_lengths(self, model, params, oracle_params):
        """Padded batch of different-length problems matches per-problem."""
        rng = np.random.default_rng(11)
        pairs = []
        for t in range(4):
            x, y = simulate_pair(rng, model, length=8 + 3 * t)
            pairs.append((x, y, diagonal_guide(len(y), len(x))))
        W = max(len(x) for x, _, _ in pairs) + 2
        batch = prepare_banded_batch(pairs, band_width=W)
        scores, fstates, bps = viterbi_decode_batch(batch, params)
        for b, (x, y, _) in enumerate(pairs):
            want_score, want_cigar = oracle.viterbi_full(x, y, oracle_params)
            assert float(scores[b]) == pytest.approx(want_score, abs=1e-3)
            got = viterbi_traceback(
                np.asarray(bps)[b], np.asarray(batch.offsets)[b],
                len(y), len(x), int(fstates[b]),
            )
            assert cigar_to_string(got) == cigar_to_string(want_cigar)

    def test_viterbi_score_below_forward(self, model, params):
        """Viterbi (single path) <= forward (sum over paths)."""
        from nanopore_tpu.ops.pairhmm import forward_loglik

        rng = np.random.default_rng(5)
        x, y = simulate_pair(rng, model, length=15)
        W = len(x) + 2
        batch = prepare_banded_batch(
            [(x, y, diagonal_guide(len(y), len(x)))], band_width=W
        )
        scores, _, _ = viterbi_decode_batch(batch, params)
        ll = forward_loglik(batch, params)
        assert float(scores[0]) <= float(ll[0]) + 1e-4


class TestViterbiMapper:
    """The engine's fast decode path (MapperConfig.decode='viterbi')."""

    def test_engine_viterbi_decode(self):
        from nanopore_tpu.mapping.engine import MappingEngine, MapperConfig
        from tests.test_mapping import make_ref, noisy_copy

        rng = np.random.default_rng(42)
        ref = make_ref(rng, 3000)
        engine = MappingEngine(
            {"ref1": ref}, MapperConfig(batch_size=2, decode="viterbi")
        )
        true_start = 500
        read = noisy_copy(rng, ref[true_start : true_start + 800])
        recs = engine.map_read("r1", read)
        assert len(recs) >= 1
        primary = [r for r in recs if not r.is_secondary][0]
        assert primary.rname == "ref1"
        assert abs(primary.pos - true_start) < 30
        consumed = sum(
            l for op, l in primary.cigar if op in (CIG.M, CIG.I, CIG.S)
        )
        assert consumed == len(read)
        n_match = sum(l for op, l in primary.cigar if op == CIG.M)
        assert n_match > 0.8 * len(read)

    def test_viterbi_preset_registered(self):
        from nanopore_tpu.mapping.presets import MAPPER_REGISTRY

        for name in ("Viterbi", "ViterbiChain", "ViterbiRealign",
                     "ViterbiRealignEm", "ViterbiRealignTrainedModel"):
            spec = MAPPER_REGISTRY[name]
            assert spec.config.decode == "viterbi"
            assert spec.base_name == "Viterbi"


class TestStructureGuard:
    """Non-canonical transition structures must route to the XLA path
    (the single-plane backpointer pack cannot represent them) instead
    of raising inside PallasViterbiPlan — dispatch-level guard."""

    def _noncanonical(self, params):
        import jax.numpy as jnp

        t = np.asarray(params.t, np.float64).copy()
        # gap state 2 entered from gap state 1: outside the canonical
        # fiveState structure (gap states entered from match/self only)
        t[1, 2] = 0.05
        t[1] /= t[1].sum()
        return params._replace(t=jnp.asarray(t, jnp.float32))

    def test_structure_ok_and_memoized(self, params):
        from nanopore_tpu.ops.pairhmm_pallas_viterbi import (
            _STRUCTURE_OK_CACHE,
            viterbi_structure_ok,
        )

        assert viterbi_structure_ok(params) is True
        bad = self._noncanonical(params)
        assert viterbi_structure_ok(bad) is False
        # memoized: the table object is cached with its verdict
        assert _STRUCTURE_OK_CACHE[id(params.t)][1] is True
        assert _STRUCTURE_OK_CACHE[id(bad.t)][1] is False
        assert viterbi_structure_ok(bad) is False

    def test_dispatch_falls_back_to_xla(self, model, params, monkeypatch):
        """prepared_from_pairs(prepared_cls=PreparedViterbi) with a
        forced-pallas choice and a non-canonical model must degrade to
        the XLA BandedBatch path and decode, not crash."""
        from nanopore_tpu.ops.dispatch import (
            PreparedViterbi,
            prepared_from_pairs,
        )

        monkeypatch.setenv("NANOPORE_TPU_KERNEL", "pallas")
        bad = self._noncanonical(params)
        rng = np.random.default_rng(11)
        pairs = []
        for _ in range(2):
            x, y = simulate_pair(rng, model, length=40)
            pairs.append((x, y, diagonal_guide(len(y), len(x))))
        prep = prepared_from_pairs(
            {}, pairs, bad, band_width=64, prepared_cls=PreparedViterbi
        )
        assert prep._plan is None  # XLA fallback, not a Pallas plan
        scores, cigars = prep.decode()
        assert len(cigars) == len(pairs)
        for (x, y, _), cigar in zip(pairs, cigars):
            _cigar_len_check(cigar, len(y), len(x))
        assert np.all(np.isfinite(np.asarray(scores)))
