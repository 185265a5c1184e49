"""Oracle tests: banded JAX pair-HMM vs the NumPy log-space reference.

Strategy per SURVEY.md section 4: every kernel is validated against a
dense NumPy oracle on small random instances, including posterior and
EM-expectation parity, plus banding-specific invariants.
"""

import numpy as np
import pytest

from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.ops import pairhmm_ref as oracle
from nanopore_tpu.ops.pairhmm import (
    KernelParams,
    make_kernel_params,
    band_offsets_from_cigar,
    prepare_banded_batch,
    forward_loglik,
    forward_backward,
    extract_posterior_pairs,
)
from nanopore_tpu.io.sam import CIG


def simulate_pair(rng, model, length=20):
    """Sample (ref_codes, read_codes) by running the HMM generatively."""
    x, y = [], []
    state = 0
    t = model.transitions
    e_match = model.match_emissions()
    e_gap = model.gap_emissions()
    while len(x) < length or len(y) < length:
        if state == 0:
            pair = rng.choice(16, p=model.emissions[0] / model.emissions[0].sum())
            x.append(pair // 4)
            y.append(pair % 4)
        elif state in (1, 3):
            x.append(rng.choice(4, p=e_gap[state] / e_gap[state].sum()))
        else:
            y.append(rng.choice(4, p=e_gap[state] / e_gap[state].sum()))
        state = rng.choice(5, p=t[state])
    return np.array(x, np.int8), np.array(y, np.int8)


def diagonal_guide(m, n):
    """A trivial global guide cigar: matches then a trailing gap run."""
    d = min(m, n)
    cig = [(CIG.M, d)]
    if m > d:
        cig.append((CIG.I, m - d))
    if n > d:
        cig.append((CIG.D, n - d))
    return cig


@pytest.fixture(scope="module")
def model():
    return PairHmmModel.default()


@pytest.fixture(scope="module")
def params(model):
    return make_kernel_params(model)


@pytest.fixture(scope="module")
def oracle_params(model):
    return oracle.PairHmmParams.from_model(model)


class TestBandOffsets:
    def test_properties(self):
        m, n, W = 30, 40, 8
        cig = [(CIG.M, 20), (CIG.D, 10), (CIG.M, 5), (CIG.I, 5), (CIG.D, 5)]
        o = band_offsets_from_cigar(cig, m, n, W)
        assert o.shape == (m + n + 1,)
        assert o[0] == 0
        assert o[m + n] == n  # final cell (m, n) at band index 0
        d = np.diff(o)
        assert ((d >= 0) & (d <= 1)).all()
        # band always inside the valid j range
        ks = np.arange(m + n + 1)
        assert (o >= np.maximum(0, ks - m)).all()

    def test_contains_guide_path(self):
        rng = np.random.default_rng(0)
        m, n, W = 25, 33, 8
        cig = [(CIG.M, 10), (CIG.I, 10), (CIG.M, 3), (CIG.D, 20), (CIG.I, 2)]
        o = band_offsets_from_cigar(cig, m, n, W)
        # walk the path, check every vertex lies in [o[k], o[k]+W)
        i = j = 0
        for op, length in cig:
            for _ in range(length):
                if op == CIG.M:
                    i, j = i + 1, j + 1
                elif op == CIG.I:
                    i += 1
                else:
                    j += 1
                k = i + j
                assert o[k] <= j < o[k] + W


class TestForwardOracle:
    def make_case(self, rng, model, m=14, n=17):
        x = rng.integers(0, 4, n).astype(np.int8)
        y = rng.integers(0, 4, m).astype(np.int8)
        return x, y

    def test_loglik_full_band(self, model, params, oracle_params):
        rng = np.random.default_rng(1)
        x, y = self.make_case(rng, model)
        m, n = len(y), len(x)
        W = n + 2  # full-width band: banding exact
        batch = prepare_banded_batch([(x, y, diagonal_guide(m, n))], band_width=W)
        got = np.asarray(forward_loglik(batch, params))[0]
        _, want = oracle.forward_full(x, y, oracle_params)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_loglik_simulated_pair(self, model, params, oracle_params):
        rng = np.random.default_rng(2)
        x, y = simulate_pair(rng, model, length=25)
        m, n = len(y), len(x)
        W = max(m, n) + 2
        batch = prepare_banded_batch([(x, y, diagonal_guide(m, n))], band_width=W)
        got = np.asarray(forward_loglik(batch, params))[0]
        _, want = oracle.forward_full(x, y, oracle_params)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_loglik_with_n_bases(self, model, params, oracle_params):
        rng = np.random.default_rng(3)
        x, y = self.make_case(rng, model, m=10, n=12)
        x[3] = 4
        y[5] = 4
        W = 14
        batch = prepare_banded_batch([(x, y, diagonal_guide(len(y), len(x)))], band_width=W)
        got = np.asarray(forward_loglik(batch, params))[0]
        _, want = oracle.forward_full(x, y, oracle_params)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_narrow_band_close_to_full(self, model, params, oracle_params):
        """A band around the true alignment loses little likelihood."""
        rng = np.random.default_rng(4)
        x, y = simulate_pair(rng, model, length=40)
        m, n = len(y), len(x)
        _, want = oracle.forward_full(x, y, oracle_params)
        batch = prepare_banded_batch([(x, y, diagonal_guide(m, n))], band_width=24)
        got = np.asarray(forward_loglik(batch, params))[0]
        assert got <= want + 1e-3  # banding can only remove probability mass
        assert got > want - 0.05 * abs(want)

    def test_batched_matches_individual(self, model, params, oracle_params):
        rng = np.random.default_rng(5)
        cases = [simulate_pair(rng, model, length=l) for l in (12, 20, 28)]
        pairs = [
            (x, y, diagonal_guide(len(y), len(x))) for x, y in cases
        ]
        W = 40
        batch = prepare_banded_batch(pairs, band_width=W)
        got = np.asarray(forward_loglik(batch, params))
        for b, (x, y) in enumerate(cases):
            single = prepare_banded_batch([pairs[b]], band_width=W)
            got_single = np.asarray(forward_loglik(single, params))[0]
            np.testing.assert_allclose(got[b], got_single, rtol=1e-5)
            _, want = oracle.forward_full(x, y, oracle_params)
            np.testing.assert_allclose(got[b], want, rtol=1e-4)


class TestForwardBackwardOracle:
    def dense_gamma(self, out, batch, b, m, n):
        """Reconstruct the dense (m, n) posterior-match matrix from the band."""
        gm = np.asarray(out["gamma_match"][b])
        offsets = np.asarray(batch.offsets[b])
        dense = np.zeros((m, n))
        i_idx, j_idx, p = extract_posterior_pairs(gm, offsets, m, n, threshold=-1.0)
        dense[i_idx, j_idx] = p
        return dense

    def test_posteriors_match_oracle(self, model, params, oracle_params):
        rng = np.random.default_rng(6)
        x, y = simulate_pair(rng, model, length=18)
        m, n = len(y), len(x)
        W = max(m, n) + 2
        batch = prepare_banded_batch([(x, y, diagonal_guide(m, n))], band_width=W)
        out = forward_backward(batch, params)
        want_gamma, want_ll = oracle.posterior_match_full(x, y, oracle_params)
        np.testing.assert_allclose(
            np.asarray(out["loglik"])[0], want_ll, rtol=1e-4
        )
        got_gamma = self.dense_gamma(out, batch, 0, m, n)
        np.testing.assert_allclose(got_gamma, want_gamma, atol=2e-4)

    def test_gamma_rows_bounded(self, model, params):
        rng = np.random.default_rng(7)
        x, y = simulate_pair(rng, model, length=30)
        m, n = len(y), len(x)
        batch = prepare_banded_batch([(x, y, diagonal_guide(m, n))], band_width=32)
        out = forward_backward(batch, params)
        dense = self.dense_gamma(out, batch, 0, m, n)
        assert (dense.sum(axis=1) <= 1.0 + 1e-3).all()
        assert (dense.sum(axis=0) <= 1.0 + 1e-3).all()

    def test_em_expectations_match_oracle(self, model, params, oracle_params):
        rng = np.random.default_rng(8)
        x, y = simulate_pair(rng, model, length=15)
        m, n = len(y), len(x)
        W = max(m, n) + 2
        batch = prepare_banded_batch([(x, y, diagonal_guide(m, n))], band_width=W)
        out = forward_backward(batch, params)
        want_trans, want_emis, _ = oracle.em_expectations_full(x, y, oracle_params)
        np.testing.assert_allclose(
            np.asarray(out["trans"])[0], want_trans, rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["emis"])[0], want_emis, rtol=1e-3, atol=1e-3
        )

    def test_expected_counts_total(self, model, params):
        """Total transition count ~= number of moves; emissions ~= occupancy."""
        rng = np.random.default_rng(9)
        x, y = simulate_pair(rng, model, length=20)
        m, n = len(y), len(x)
        batch = prepare_banded_batch(
            [(x, y, diagonal_guide(m, n))], band_width=max(m, n) + 2
        )
        out = forward_backward(batch, params)
        total_moves = np.asarray(out["trans"])[0].sum()
        # every path makes between max(m,n) and m+n moves
        assert max(m, n) - 1e-2 <= total_moves <= m + n + 1e-2

    def test_trained_model_loads_into_kernel(self, params):
        import os

        path = "/root/reference/nanopore/mappers/blasr_hmm_0.txt"
        if not os.path.exists(path):
            pytest.skip("reference hmm not mounted")
        model = PairHmmModel.load(path)
        kp = make_kernel_params(model)
        op = oracle.PairHmmParams.from_model(model)
        rng = np.random.default_rng(10)
        x = rng.integers(0, 4, 20).astype(np.int8)
        y = x.copy()[:18]  # mostly-matching read
        batch = prepare_banded_batch(
            [(x, y, diagonal_guide(len(y), len(x)))], band_width=24
        )
        got = np.asarray(forward_loglik(batch, kp))[0]
        _, want = oracle.forward_full(x, y, op)
        np.testing.assert_allclose(got, want, rtol=1e-4)


class TestRematerialisedEm:
    """em_expectations (segmented backward) vs full forward_backward."""

    def _compare(self, pairs, params, band_width, segment_size):
        from nanopore_tpu.ops.pairhmm import em_expectations

        batch = prepare_banded_batch(pairs, band_width=band_width)
        full = forward_backward(batch, params)
        remat = em_expectations(batch, params, segment_size=segment_size)
        np.testing.assert_allclose(
            np.asarray(remat["loglik"]), np.asarray(full["loglik"]),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(remat["trans"]), np.asarray(full["trans"]),
            rtol=2e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(remat["emis"]), np.asarray(full["emis"]),
            rtol=2e-4, atol=1e-6,
        )

    def test_segment_divides_k(self, model, params):
        rng = np.random.default_rng(21)
        x, y = simulate_pair(rng, model, length=20)
        pairs = [(x, y, diagonal_guide(len(y), len(x)))]
        K = len(x) + len(y)
        self._compare(pairs, params, band_width=12, segment_size=K // 4)

    def test_segment_not_dividing_k(self, model, params):
        rng = np.random.default_rng(22)
        x, y = simulate_pair(rng, model, length=23)
        pairs = [(x, y, diagonal_guide(len(y), len(x)))]
        self._compare(pairs, params, band_width=12, segment_size=7)

    def test_batched_mixed_lengths(self, model, params):
        rng = np.random.default_rng(23)
        pairs = []
        for t in range(3):
            x, y = simulate_pair(rng, model, length=10 + 5 * t)
            pairs.append((x, y, diagonal_guide(len(y), len(x))))
        self._compare(pairs, params, band_width=16, segment_size=8)

    def test_matches_dense_oracle(self, model, params, oracle_params):
        from nanopore_tpu.ops.pairhmm import em_expectations

        rng = np.random.default_rng(24)
        x, y = simulate_pair(rng, model, length=12)
        W = max(len(x), len(y)) + 2
        batch = prepare_banded_batch(
            [(x, y, diagonal_guide(len(y), len(x)))], band_width=W
        )
        remat = em_expectations(batch, params, segment_size=5)
        trans, emis, loglik = oracle.em_expectations_full(x, y, oracle_params)
        np.testing.assert_allclose(
            np.asarray(remat["loglik"])[0], loglik, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(remat["trans"])[0], trans, rtol=1e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(remat["emis"])[0], emis, rtol=1e-3, atol=1e-5
        )


class TestFusedRealign:
    """realign_fused (remat fwd/bwd + reverse-MEA) vs the two-pass path."""

    def _cases(self, model, seed, count=4, base_len=12):
        rng = np.random.default_rng(seed)
        pairs = []
        for t in range(count):
            x, y = simulate_pair(rng, model, length=base_len + 3 * t)
            pairs.append((x, y, diagonal_guide(len(y), len(x))))
        return pairs

    def test_matches_two_pass(self, model, params):
        from nanopore_tpu.ops.mea import (
            mea_decode_batch,
            mea_traceback,
            mea_traceback_fwd,
            realign_fused,
        )

        pairs = self._cases(model, 31)
        batch = prepare_banded_batch(pairs, band_width=16)
        fb = forward_backward(batch, params)
        dirs_b, scores_b = mea_decode_batch(
            fb, batch.offsets, batch.m, batch.n, 16
        )
        fused = realign_fused(batch, params, segment_size=8)
        np.testing.assert_allclose(
            np.asarray(fused["loglik"]), np.asarray(fb["loglik"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(fused["trans"]), np.asarray(fb["trans"]),
            rtol=2e-4, atol=1e-6,
        )
        offsets = np.asarray(batch.offsets)
        k_end = np.asarray(batch.k_end)
        for b, (x, y, _) in enumerate(pairs):
            m, n = len(y), len(x)
            if k_end[b] == batch.k_max:
                # two-pass score is only meaningful for unpadded reads
                # (mea.py: "for batch-padded reads the caller ignores it");
                # the fused score is valid for every read
                np.testing.assert_allclose(
                    float(fused["score"][b]), float(scores_b[b]),
                    rtol=1e-4, atol=1e-4,
                )
            want = mea_traceback(np.asarray(dirs_b)[b], offsets[b], m, n)
            got = mea_traceback_fwd(
                np.asarray(fused["dirs"])[b], offsets[b], m, n
            )
            # identical optimum; identical path when gammas are generic
            from nanopore_tpu.io.sam import cigar_to_string

            assert cigar_to_string(got) == cigar_to_string(want)

    def test_cigar_global_invariant(self, model, params):
        from nanopore_tpu.ops.mea import mea_traceback_fwd, realign_fused

        pairs = self._cases(model, 33, count=3, base_len=20)
        batch = prepare_banded_batch(pairs, band_width=10)
        fused = realign_fused(batch, params, segment_size=16)
        offsets = np.asarray(batch.offsets)
        for b, (x, y, _) in enumerate(pairs):
            m, n = len(y), len(x)
            cigar = mea_traceback_fwd(
                np.asarray(fused["dirs"])[b], offsets[b], m, n
            )
            assert sum(l for op, l in cigar if op in (CIG.M, CIG.I)) == m
            assert sum(l for op, l in cigar if op in (CIG.M, CIG.D)) == n
