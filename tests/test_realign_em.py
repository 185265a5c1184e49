"""Tests for batched realignment and Baum-Welch EM."""

import numpy as np
import pytest
from unittest import mock

from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.align.realign import realign_records, realign_sam_file
from nanopore_tpu.align.em import em_train, learn_model_from_sam_file, EmOptions
from nanopore_tpu.io.encoding import encode, decode
from nanopore_tpu.io.sam import SamRecord, SamWriter, SamReader, CIG
from nanopore_tpu.io.seqio import fasta_write, fastq_write


def simulate_alignment(rng, n=300, sub=0.08, ins=0.04, dele=0.04):
    """(ref, read, true cigar) with a noisy read generated from ref."""
    ref = rng.integers(0, 4, n).astype(np.int8)
    read, ops = [], []
    for b in ref:
        r = rng.random()
        if r < dele:
            ops.append((CIG.D, 1))
            continue
        if r < dele + ins:
            read.append(rng.integers(0, 4))
            ops.append((CIG.I, 1))
        read.append(b if rng.random() > sub else rng.integers(0, 4))
        ops.append((CIG.M, 1))
    merged = []
    for op, l in ops:
        if merged and merged[-1][0] == op:
            merged[-1] = (op, merged[-1][1] + l)
        else:
            merged.append([op, l])
    return ref, np.array(read, np.int8), [tuple(x) for x in merged]


def crude_guide(m, n):
    d = min(m, n)
    g = [(CIG.M, d)]
    if m > d:
        g.append((CIG.I, m - d))
    if n > d:
        g.append((CIG.D, n - d))
    return g


def cigar_matches(cigar, ref, read):
    """Count exact base matches under a cigar."""
    i = j = matches = 0
    for op, l in cigar:
        if op == CIG.M:
            matches += int((read[i : i + l] == ref[j : j + l]).sum())
            i += l
            j += l
        elif op == CIG.I:
            i += l
        else:
            j += l
    return matches


class TestDeviceTraceback:
    def test_matches_host_walk(self):
        """traceback_cigars_batch (on-device scan + host RLE) is pinned
        to the per-cell host walk mea_traceback_fwd on mixed-geometry
        batches (different lengths, indel guides, N bases)."""
        from nanopore_tpu.ops.pairhmm import (
            make_kernel_params,
            prepare_banded_batch,
        )
        from nanopore_tpu.ops.mea import (
            mea_traceback_fwd,
            realign_fused,
            traceback_cigars_batch,
        )

        rng = np.random.default_rng(31)
        pairs = []
        for b in range(5):
            ref, read, _ = simulate_alignment(rng, n=200 + 17 * b)
            pairs.append((ref, read, crude_guide(len(read), len(ref))))
        # one read with an N base
        pairs[2][1][10] = 4
        params = make_kernel_params(PairHmmModel.default())
        batch = prepare_banded_batch(pairs, band_width=16)
        fused = realign_fused(batch, params)
        got = traceback_cigars_batch(
            fused["dirs"], batch.offsets, batch.m, batch.n
        )
        dirs_np = np.asarray(fused["dirs"])
        offs_np = np.asarray(batch.offsets)
        for b, (x, y, _) in enumerate(pairs):
            want = mea_traceback_fwd(
                dirs_np[b], offs_np[b], len(y), len(x)
            )
            assert got[b] == want
            # global-alignment invariant (utils.py:381-382)
            assert sum(l for op, l in got[b] if op in (CIG.M, CIG.I)) == len(y)
            assert sum(l for op, l in got[b] if op in (CIG.M, CIG.D)) == len(x)

    def test_degenerate_rows(self):
        """Empty-ish rows: a read much shorter than the band's K."""
        from nanopore_tpu.ops.mea import (
            OP_NONE,
            _rle_ops_row,
            traceback_cigars_batch,
        )
        import jax.numpy as jnp

        assert _rle_ops_row(np.full(8, OP_NONE, np.int8)) == []
        # dirs all DIR_NONE: fallback consumes D's then I's
        W = 8
        dirs = np.full((1, 7, W), 3, np.int8)
        offsets = np.zeros((1, 7), np.int32)
        cig = traceback_cigars_batch(
            jnp.asarray(dirs), jnp.asarray(offsets),
            np.array([2]), np.array([3]),
        )[0]
        assert cig == [(CIG.D, 3), (CIG.I, 2)]


class TestRealign:
    def test_realign_improves_crude_guide(self):
        rng = np.random.default_rng(0)
        ref, read, true_cigar = simulate_alignment(rng)
        m, n = len(read), len(ref)
        rec = SamRecord(
            qname="r1", flag=0, rname="ref", pos=0,
            cigar=crude_guide(m, n), seq=decode(read),
        )
        before = cigar_matches(rec.cigar, ref, read)
        realign_records([rec], {"ref": decode(ref)}, band_width=64)
        after = cigar_matches(rec.cigar, ref, read)
        truth = cigar_matches(true_cigar, ref, read)
        # global invariants preserved
        assert sum(l for op, l in rec.cigar if op in (CIG.M, CIG.D)) == n
        assert sum(l for op, l in rec.cigar if op in (CIG.M, CIG.I)) == m
        assert after > before
        assert after >= 0.95 * truth

    def test_realign_rescore(self):
        rng = np.random.default_rng(1)
        ref, read, _ = simulate_alignment(rng, n=150)
        rec = SamRecord(
            qname="r1", flag=0, rname="ref", pos=0,
            cigar=crude_guide(len(read), len(ref)), seq=decode(read),
        )
        scores = realign_records(
            [rec], {"ref": decode(ref)}, rescore=True, band_width=64
        )
        assert len(scores) == 1
        assert 0.2 < scores[0] <= 1.0

    def test_realign_sam_file_end_to_end(self, tmp_path):
        rng = np.random.default_rng(2)
        ref, read, _ = simulate_alignment(rng, n=200)
        fa = str(tmp_path / "ref.fa")
        fq = str(tmp_path / "r.fq")
        fasta_write(fa, "ref", decode(ref))
        with open(fq, "w") as fh:
            fastq_write(fh, "r1", decode(read), None)
        sam_in = str(tmp_path / "in.sam")
        # a local alignment covering most of the read (as a mapper emits)
        with SamWriter(sam_in, {"ref": len(ref)}) as w:
            w.write(
                SamRecord(
                    qname="r1", flag=0, rname="ref", pos=0,
                    cigar=crude_guide(len(read), len(ref)), seq=decode(read),
                )
            )
        sam_out = str(tmp_path / "out.sam")
        realign_sam_file(sam_in, sam_out, fq, fa)
        [rec] = list(SamReader(sam_out).mapped())
        assert rec.pos == 0
        assert sum(l for op, l in rec.cigar if op in (CIG.M, CIG.D)) == len(ref)
        assert sum(l for op, l in rec.cigar if op in (CIG.M, CIG.I)) == len(read)


class TestEm:
    def make_pairs(self, rng, n_pairs=3, n=120):
        pairs = []
        for _ in range(n_pairs):
            ref, read, cigar = simulate_alignment(rng, n=n)
            pairs.append((ref, read, cigar))
        return pairs

    def test_likelihood_increases(self):
        rng = np.random.default_rng(3)
        pairs = self.make_pairs(rng)
        opts = EmOptions(trials=1, iterations=8, band_width=48, seed=7)
        result = em_train(pairs, opts)
        trace = result.running_likelihoods[0]
        assert len(trace) >= 3
        # Baum-Welch monotonicity (small f32 slack)
        diffs = np.diff(trace)
        assert (diffs > -abs(np.array(trace[:-1])) * 1e-4).all()
        assert trace[-1] > trace[0]

    def test_learns_match_structure(self):
        """EM on high-identity data drives match emissions diagonal-heavy."""
        rng = np.random.default_rng(4)
        pairs = self.make_pairs(rng, n_pairs=4, n=150)
        opts = EmOptions(trials=2, iterations=12, band_width=48, seed=1)
        result = em_train(pairs, opts)
        e0 = result.model.emissions[0].reshape(4, 4)
        diag_mass = np.trace(e0) / e0.sum()
        assert diag_mass > 0.6  # data has ~92% identity on aligned pairs

    def test_learn_model_from_sam_file(self, tmp_path):
        rng = np.random.default_rng(5)
        ref, read, cigar = simulate_alignment(rng, n=150)
        fa = str(tmp_path / "ref.fa")
        fasta_write(fa, "ref", decode(ref))
        sam = str(tmp_path / "chained.sam")
        with SamWriter(sam, {"ref": len(ref)}) as w:
            w.write(
                SamRecord(
                    qname="r1", flag=0, rname="ref", pos=0,
                    cigar=cigar, seq=decode(read),
                )
            )
        out = str(tmp_path / "hmm.txt")
        opts = EmOptions(trials=2, iterations=4, band_width=48)
        final = learn_model_from_sam_file(sam, fa, out, opts)
        # on-disk formats load back
        m2 = PairHmmModel.load(out)
        np.testing.assert_allclose(m2.emissions[1:], 1.0 / 16.0)  # flat indels
        rows = m2.emissions[0].reshape(4, 4).sum(axis=1)
        np.testing.assert_allclose(rows, 0.25, atol=1e-9)  # GC 0.5 rows
        mu = PairHmmModel.load(out + "_unnormalised")
        assert mu.likelihood == final.likelihood
        import xml.etree.ElementTree as ET

        root = ET.parse(out + ".xml").getroot()
        assert len(root.findall("transition")) == 25
        assert len(root.findall("hmm")) == 2  # one per trial


class TestEmMesh:
    def test_em_train_use_mesh(self):
        """Mesh-sharded EM path produces a valid model and improves."""
        import numpy as np
        from nanopore_tpu.align.em import em_train, EmOptions

        rng = np.random.default_rng(9)
        pairs = []
        for _ in range(3):  # not divisible by dp: exercises padding
            ref, read, cigar = simulate_alignment(rng, n=100)
            pairs.append((ref, read, cigar))
        result = em_train(
            pairs,
            EmOptions(trials=2, iterations=5, band_width=32, use_mesh=True),
        )
        np.testing.assert_allclose(
            result.model.transitions.sum(axis=1), 1.0, atol=1e-5
        )
        for trace in result.running_likelihoods:
            assert trace[-1] > trace[0]
        # per-trial models must be the real per-trial results (round-1
        # regression: the sharded path returned [winner] only, so the
        # hmm.txt.xml across-trial std degenerated to zero in mesh mode)
        assert len(result.trial_models) == 2
        t_stack = np.stack([m.transitions for m in result.trial_models])
        assert t_stack.std(axis=0).max() > 0


class TestEmCheckpoint:
    """Mid-training checkpoint/resume (SURVEY.md section 5 aux plan)."""

    def _pairs(self, rng, n_pairs=3, n=120):
        pairs = []
        for _ in range(n_pairs):
            ref, read, cigar = simulate_alignment(rng, n=n)
            pairs.append((ref, read, cigar))
        return pairs

    def test_resume_matches_uninterrupted(self, tmp_path, monkeypatch):
        """Kill EM mid-trial; the resumed run reproduces the full run."""
        import nanopore_tpu.align.em as em_mod

        rng = np.random.default_rng(11)
        pairs = self._pairs(rng)
        ck = str(tmp_path / "em.ckpt.npz")

        def run(interrupt_after=None, resume=False):
            opts = EmOptions(
                trials=2, iterations=6, band_width=48, seed=3,
                convergence_tol=0.0, checkpoint_path=ck,
                checkpoint_every=1,
            )
            real = em_mod.em_expectations
            calls = {"n": 0}

            def counting(*a, **kw):
                calls["n"] += 1
                if interrupt_after is not None and calls["n"] > interrupt_after:
                    raise KeyboardInterrupt
                return real(*a, **kw)

            monkeypatch.setattr(em_mod, "em_expectations", counting)
            try:
                return em_train(pairs, opts)
            finally:
                monkeypatch.setattr(em_mod, "em_expectations", real)

        expected = run()  # uninterrupted (ckpt written then removed)
        import os

        assert not os.path.exists(ck)

        # interrupt partway through trial 1 (after trial 0 completed)
        with pytest.raises(KeyboardInterrupt):
            run(interrupt_after=8)
        assert os.path.exists(ck)

        resumed = run()  # resumes from the checkpoint
        assert not os.path.exists(ck)
        np.testing.assert_allclose(
            resumed.model.transitions, expected.model.transitions,
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            resumed.model.emissions, expected.model.emissions, rtol=1e-12
        )
        assert resumed.running_likelihoods == expected.running_likelihoods

    def test_sharded_resume(self, tmp_path, monkeypatch):
        """Sharded EM resumes from a snapshot to the same trajectory."""
        import os

        import nanopore_tpu.parallel.sharded_em as sem
        from nanopore_tpu.ops.pairhmm import prepare_banded_batch
        from nanopore_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(12)
        pairs = self._pairs(rng, n_pairs=4, n=100)
        batch = prepare_banded_batch(pairs, band_width=32)
        mesh = make_mesh(n_trials=2)
        ck = str(tmp_path / "sem.ckpt.npz")
        kwargs = dict(trials=2, iterations=5, seed=5, convergence_tol=0.0)

        expected_model, expected_trials, expected_traces = (
            sem.sharded_em_train(batch, mesh, **kwargs)
        )

        # crash on the 4th iteration: the iteration-2 checkpoint survives
        real_factory = sem.make_sharded_em_step

        def factory(mesh_, bw, pseudocount=1e-6):
            real_step = real_factory(mesh_, bw, pseudocount)
            calls = {"n": 0}

            def step(tm, arrs):
                calls["n"] += 1
                if calls["n"] > 3:
                    raise KeyboardInterrupt
                return real_step(tm, arrs)

            return step

        monkeypatch.setattr(sem, "make_sharded_em_step", factory)
        with pytest.raises(KeyboardInterrupt):
            sem.sharded_em_train(
                batch, mesh, checkpoint_path=ck, checkpoint_every=2,
                **kwargs,
            )
        monkeypatch.setattr(sem, "make_sharded_em_step", real_factory)
        assert os.path.exists(ck)

        resumed_model, resumed_trials, resumed_traces = (
            sem.sharded_em_train(
                batch, mesh, checkpoint_path=ck, checkpoint_every=2,
                **kwargs,
            )
        )
        assert not os.path.exists(ck)
        for tr_r, tr_e in zip(resumed_traces, expected_traces):
            np.testing.assert_allclose(tr_r, tr_e, rtol=1e-6)
        np.testing.assert_allclose(
            resumed_model.transitions, expected_model.transitions,
            rtol=1e-6,
        )


class TestGlobalWindowing:
    """window_global_pair: the banded --splitMatrixBiggerThanThis
    analogue — realigning only the aligned ref window must reproduce
    the full-reference realignment exactly once spliced back."""

    def _case(self, rng, n=900, m=150, lead=350, tail=None):
        from nanopore_tpu.io.encoding import decode as dec

        ref = rng.integers(0, 4, n).astype(np.int8)
        tail = n - lead - m if tail is None else tail
        y = ref[lead : lead + m].copy()
        y[rng.integers(0, m, 4)] = rng.integers(0, 4, 4)
        cigar = [(CIG.D, lead), (CIG.M, m), (CIG.D, n - lead - m)]
        rec = SamRecord(
            qname="r", flag=0, rname="ref", pos=0, mapq=0,
            cigar=cigar, seq=dec(y), qual="*",
        )
        return {"ref": dec(ref)}, rec

    def test_window_matches_full_reference_realign(self):
        import copy
        from functools import partial

        import nanopore_tpu.align.realign as ra

        rng = np.random.default_rng(23)
        ref_seqs, rec = self._case(rng)
        rec_w = copy.deepcopy(rec)
        rec_f = copy.deepcopy(rec)
        # windowed (default pad=128 — flanks well beyond it)
        ra.realign_records([rec_w], ref_seqs)
        # forced identity window
        orig = ra.window_global_pair
        with mock.patch.object(
            ra, "window_global_pair", partial(orig, pad=10**9)
        ):
            ra.realign_records([rec_f], ref_seqs)
        assert rec_w.cigar == rec_f.cigar
        # global invariant: consumes the whole read and reference
        n = len(ref_seqs["ref"])
        assert sum(
            l for op, l in rec_w.cigar if op in (CIG.M, CIG.D)
        ) == n
        assert sum(
            l for op, l in rec_w.cigar if op in (CIG.M, CIG.I)
        ) == len(rec.seq)

    def test_window_noop_when_no_flanks(self):
        from nanopore_tpu.align.realign import window_global_pair
        from nanopore_tpu.io.encoding import encode as enc

        rng = np.random.default_rng(3)
        x = rng.integers(0, 4, 40).astype(np.int8)
        cig = [(CIG.M, 40)]
        xw, guide, j0, j1 = window_global_pair(x, cig)
        assert (j0, j1) == (0, 40) and guide == cig
        assert xw is x or (np.asarray(xw) == x).all()

    def test_splice_merges_runs(self):
        from nanopore_tpu.align.realign import splice_window_cigar

        out = splice_window_cigar(
            [(CIG.D, 5), (CIG.M, 10), (CIG.D, 2)], 100, 117, 300
        )
        assert out == [(CIG.D, 105), (CIG.M, 10), (CIG.D, 185)]
