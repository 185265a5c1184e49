"""Parity tests: native seed/chain runtime vs the NumPy fallback."""

import os

import numpy as np
import pytest

from nanopore_tpu.io.encoding import encode
from nanopore_tpu.runtime import native_index


pytestmark = pytest.mark.skipif(
    native_index.get_lib() is None, reason="native runtime unavailable"
)


class TestNativeIndex:
    def test_build_matches_numpy(self):
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 4, 500).astype(np.int8)
        codes[100:103] = 4  # N gap
        k = 7
        kmers, positions = native_index.build_index(codes, k)
        # numpy reference
        from nanopore_tpu.mapping.index import kmer_codes

        ref_kmers, valid = kmer_codes(codes, k)
        ref_pos = np.nonzero(valid)[0]
        ref_kmers = ref_kmers[valid]
        order = np.argsort(ref_kmers, kind="stable")
        np.testing.assert_array_equal(kmers, ref_kmers[order])
        np.testing.assert_array_equal(positions, ref_pos[order])

    def test_mask_repeats(self):
        kmers = np.array([1, 1, 1, 2, 3, 3], np.int64)
        positions = np.arange(6, dtype=np.int32)
        k2, p2 = native_index.mask_repeats(kmers, positions, max_occ=2)
        assert k2.tolist() == [2, 3, 3]
        assert p2.tolist() == [3, 4, 5]

    def test_lookup_matches_numpy(self):
        os.environ.pop("NANOPORE_TPU_NO_NATIVE", None)
        rng = np.random.default_rng(1)
        from nanopore_tpu.mapping.index import KmerIndex
        from nanopore_tpu.io.encoding import decode

        ref = decode(rng.integers(0, 4, 2000).astype(np.int8))
        idx = KmerIndex.build({"r": ref}, k=11)
        read = encode(ref[300:600])
        rp_native, qp_native = idx.lookup(read)

        os.environ["NANOPORE_TPU_NO_NATIVE"] = "1"
        try:
            # force the numpy path by bypassing get_lib
            import nanopore_tpu.runtime.native_index as ni

            saved = ni._lib
            ni._lib = None
            ni._tried = True
            rp_np, qp_np = idx.lookup(read)
            ni._lib = saved
            ni._tried = True
        finally:
            os.environ.pop("NANOPORE_TPU_NO_NATIVE", None)
        # same hit sets (order may differ)
        assert set(zip(rp_native.tolist(), qp_native.tolist())) == set(
            zip(rp_np.tolist(), qp_np.tolist())
        )

    def test_chain_dp_matches_numpy(self):
        rng = np.random.default_rng(2)
        A = 40
        qs = np.sort(rng.integers(0, 3000, A)).astype(np.int32)
        lens = rng.integers(13, 40, A)
        qe = (qs + lens).astype(np.int32)
        rs = (qs + rng.integers(-50, 50, A)).astype(np.int32)
        re = (rs + lens).astype(np.int32)
        order = np.lexsort((qs, rs))
        qs, qe, rs, re = qs[order], qe[order], rs[order], re[order]
        ln = lens[order].astype(np.float64)

        score_n, parent_n = native_index.chain_dp(
            qs, qe, rs, re, ln, 5000, 500, 1.0, 0.05
        )
        # numpy reference DP
        score = ln.copy()
        parent = np.full(A, -1)
        for i in range(1, A):
            dq = qs[i] - qe[:i]
            dr = rs[i] - re[:i]
            ok = (dq > 0) & (dr > 0) & (dr <= 5000)
            drift = np.abs(dq - dr)
            ok &= drift <= 500
            if not ok.any():
                continue
            gap = 1.0 + 0.05 * np.minimum(np.abs(dq), dr) + 0.5 * drift
            cand = np.where(ok, score[:i] + ln[i] - gap, -np.inf)
            j = int(np.argmax(cand))
            if cand[j] > score[i]:
                score[i] = cand[j]
                parent[i] = j
        np.testing.assert_allclose(score_n, score, rtol=1e-12)
        np.testing.assert_array_equal(parent_n, parent)

    def test_merge_anchors_native(self):
        ref_pos = np.array([10, 11, 12, 30, 100], np.int32)
        read_pos = np.array([0, 1, 2, 20, 50], np.int32)
        q, r, l = native_index.merge_anchors(ref_pos, read_pos, 5)
        spans = set(zip(q.tolist(), r.tolist(), l.tolist()))
        assert (0, 10, 7) in spans
        assert (20, 30, 5) in spans
        assert (50, 100, 5) in spans


class TestNativePairHmmBaseline:
    """The single-core C++ fused realign (the measured CPU baseline for
    bench.py) must match ops.mea.realign_fused cell for cell."""

    def test_parity_with_realign_fused(self):
        from nanopore_tpu.align.model import PairHmmModel
        from nanopore_tpu.io.sam import CIG
        from nanopore_tpu.ops.pairhmm import (
            make_kernel_params,
            prepare_banded_batch,
        )
        from nanopore_tpu.ops.mea import realign_fused, mea_traceback_fwd
        from nanopore_tpu.runtime.native_pairhmm import cpu_realign_batch

        rng = np.random.default_rng(3)
        model = PairHmmModel.load("nanopore_tpu/models/blasr_hmm_0.txt")
        params = make_kernel_params(model)
        pairs = []
        for L in (60, 100, 100):
            x = rng.integers(0, 4, L).astype(np.int8)
            keep = rng.random(L) > 0.05
            y = x[keep]
            sub = rng.random(len(y)) < 0.1
            y = np.where(sub, rng.integers(0, 4, len(y)), y).astype(np.int8)
            d = min(len(y), L)
            guide = [(CIG.M, d)] + ([(CIG.D, L - d)] if L > d else [])
            pairs.append((x, y, guide))
        batch = prepare_banded_batch(pairs, band_width=16)
        got = cpu_realign_batch(batch, params)
        if got is None:
            import pytest

            pytest.skip("native toolchain unavailable")
        want = {
            k: np.asarray(v) for k, v in realign_fused(batch, params).items()
        }
        np.testing.assert_allclose(
            got["loglik"], want["loglik"], rtol=2e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            got["score"], want["score"], rtol=2e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            got["trans"], want["trans"], rtol=2e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            got["emis"], want["emis"], rtol=2e-3, atol=1e-4
        )
        offsets = np.asarray(batch.offsets)
        for b, (x, y, _) in enumerate(pairs):
            got_cig = mea_traceback_fwd(
                got["dirs"][b], offsets[b], len(y), len(x)
            )
            want_cig = mea_traceback_fwd(
                want["dirs"][b], offsets[b], len(y), len(x)
            )
            assert got_cig == want_cig

    def test_oracle_gamma_matches_forward_backward(self):
        """The oracle's emit_gamma band must match the (CPU) XLA
        forward_backward posterior — it is the gamma reference
        hw_parity holds the Pallas stream against (the XLA scan's
        gammas are unreliable ON TPU, gamma_probe r3)."""
        from nanopore_tpu.align.model import PairHmmModel
        from nanopore_tpu.io.sam import CIG
        from nanopore_tpu.ops.pairhmm import (
            forward_backward,
            make_kernel_params,
            prepare_banded_batch,
        )
        from nanopore_tpu.runtime.native_pairhmm import cpu_realign_batch

        rng = np.random.default_rng(5)
        params = make_kernel_params(PairHmmModel.default())
        pairs = []
        for L in (50, 80):
            x = rng.integers(0, 4, L).astype(np.int8)
            y = x.copy()
            y[rng.integers(0, L, L // 8)] = rng.integers(0, 4, L // 8)
            pairs.append((x, y, [(CIG.M, L)]))
        batch = prepare_banded_batch(pairs, band_width=16, device=False)
        got = cpu_realign_batch(batch, params, emit_gamma=True)
        if got is None:
            import pytest

            pytest.skip("native toolchain unavailable")
        fb = forward_backward(batch, params)
        gm_want = np.asarray(fb["gamma_match"])
        offsets = np.asarray(batch.offsets)
        K1 = gm_want.shape[1]
        ks = np.arange(K1)[:, None]
        for b, (x, y, _) in enumerate(pairs):
            j = offsets[b][:K1, None] + np.arange(16)[None, :]
            i = ks - j
            valid = (i >= 1) & (i <= len(y)) & (j >= 1) & (j <= len(x))
            np.testing.assert_allclose(
                got["gamma_match"][b][:K1][valid],
                gm_want[b][valid],
                rtol=1e-3,
                atol=1e-5,
            )


class TestLargeLatticeEmAccuracy:
    """Regression for the round-1 'phase-B wrong at scale' finding: the
    EM factors exponentiate lsf + lsb - loglik, so plain-f32 running
    log-scales put O(K * eps * |partial|) error in the EXPONENT — at
    K ~ 4000 that's already ~0.5 nats (60% off); at the production
    K ~ 10^4 it reached 10-24x.  The XLA kernels now carry Kahan
    compensation (ops/pairhmm._kahan_add) and the C++ baseline
    accumulates scales in double; both must agree at large K."""

    def test_em_factors_accurate_at_large_k(self):
        from nanopore_tpu.align.model import PairHmmModel
        from nanopore_tpu.io.sam import CIG
        from nanopore_tpu.ops.pairhmm import (
            make_kernel_params,
            prepare_banded_batch,
        )
        from nanopore_tpu.ops.mea import realign_fused
        from nanopore_tpu.runtime.native_pairhmm import cpu_realign_batch

        rng = np.random.default_rng(5)
        model = PairHmmModel.load("nanopore_tpu/models/blasr_hmm_0.txt")
        params = make_kernel_params(model)
        L, W, B = 2000, 32, 2
        pairs = []
        for _ in range(B):
            x = rng.integers(0, 4, L).astype(np.int8)
            y = x.copy()
            idx = rng.integers(0, L, L // 10)
            y[idx] = (y[idx] + 1) % 4
            pairs.append((x, y, [(CIG.M, L)]))
        batch = prepare_banded_batch(pairs, band_width=W)
        got = realign_fused(batch, params, segment_size=512)
        want = cpu_realign_batch(batch, params, 0.5, 0.0)
        np.testing.assert_allclose(
            np.asarray(got["loglik"]), want["loglik"], rtol=1e-4
        )
        # before the Kahan fix these disagreed by >10x at this K
        np.testing.assert_allclose(
            np.asarray(got["score"]), want["score"], rtol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(got["trans"]).reshape(B, 25),
            np.asarray(want["trans"]).reshape(B, 25),
            rtol=5e-3, atol=1e-4,
        )
