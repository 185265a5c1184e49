"""Edge-case behaviour: empty experiments, unmapped-only SAMs."""

import os

import numpy as np
import pytest

from nanopore_tpu.io.encoding import decode
from nanopore_tpu.io.sam import SamWriter, SamRecord
from nanopore_tpu.io.seqio import fasta_write, fastq_write


@pytest.fixture()
def empty_experiment(tmp_path):
    rng = np.random.default_rng(0)
    ref = decode(rng.integers(0, 4, 300).astype(np.int8))
    fa = str(tmp_path / "ref.fa")
    fasta_write(fa, "REF", ref)
    fq = str(tmp_path / "reads.fq")
    with open(fq, "w") as fh:
        fastq_write(fh, "r1", decode(rng.integers(0, 4, 100).astype(np.int8)),
                    None)
    sam = str(tmp_path / "mapping.sam")
    with SamWriter(sam, {"REF": len(ref)}) as w:
        w.write(SamRecord(qname="r1"))  # unmapped only
    return {"fa": fa, "fq": fq, "sam": sam, "tmp": tmp_path}


class TestEmptyExperiment:
    @pytest.mark.parametrize(
        "name",
        [
            "Substitutions",
            "LocalCoverage",
            "GlobalCoverage",
            "Indels",
            "IndelKmerAnalysis",
            "ChannelMappability",
            "AlignmentUncertainty",
            "Consensus",
        ],
    )
    def test_analyses_survive_no_alignments(self, empty_experiment, name):
        from nanopore_tpu.analyses import ALL_ANALYSES, Analysis

        outdir = str(empty_experiment["tmp"] / ("a_" + name))
        os.makedirs(outdir, exist_ok=True)
        cls = ALL_ANALYSES[name]
        cls(
            empty_experiment["fq"], "2d", empty_experiment["fa"],
            empty_experiment["sam"], outdir,
        ).execute()
        assert Analysis.is_finished(outdir)

    def test_chain_empty_sam(self, empty_experiment, tmp_path):
        from nanopore_tpu.align.chain_sam import chain_sam_file
        from nanopore_tpu.io.sam import SamReader

        out = str(tmp_path / "chained.sam")
        chain_sam_file(
            empty_experiment["sam"], out, empty_experiment["fq"],
            empty_experiment["fa"],
        )
        assert list(SamReader(out).mapped()) == []

    def test_realign_empty_sam(self, empty_experiment, tmp_path):
        from nanopore_tpu.align.realign import realign_sam_file
        from nanopore_tpu.io.sam import SamReader

        out = str(tmp_path / "realigned.sam")
        realign_sam_file(
            empty_experiment["sam"], out, empty_experiment["fq"],
            empty_experiment["fa"],
        )
        assert list(SamReader(out).mapped()) == []

    def test_unknown_read_name_raises(self, empty_experiment, tmp_path):
        from nanopore_tpu.align.chain_sam import chain_sam_file
        from nanopore_tpu.io.sam import parse_cigar

        bad_sam = str(tmp_path / "bad.sam")
        with SamWriter(bad_sam, {"REF": 300}) as w:
            w.write(
                SamRecord(qname="ghost", flag=0, rname="REF", pos=0,
                          cigar=parse_cigar("5M"), seq="ACGTA")
            )
        with pytest.raises(RuntimeError, match="ghost"):
            chain_sam_file(
                bad_sam, str(tmp_path / "o.sam"), empty_experiment["fq"],
                empty_experiment["fa"],
            )


class TestAnchorSplitRealign:
    """Over-budget lattices split at guide anchors and stay on the fast
    kernel (VERDICT r4 #4; reference --splitMatrixBiggerThanThis=3000
    semantics, utils.py:587)."""

    def test_split_window_pair_partitions(self):
        import numpy as np

        from nanopore_tpu.align.realign import split_window_pair
        from nanopore_tpu.io.sam import CIG

        rng = np.random.default_rng(0)
        n = 5000
        x = rng.integers(0, 4, n).astype(np.int8)
        y = x[100:4900].copy()
        guide = [(CIG.D, 100), (CIG.M, 4800), (CIG.D, 100)]
        segs = split_window_pair(x, y, guide, max_k=3000, margin=500)
        assert len(segs) > 1
        j = i = 0
        for sj0, sj1, si0, si1, sg in segs:
            assert sj0 == j and si0 == i, "segments must chain"
            assert (sj1 - sj0) + (si1 - si0) <= 3000
            dj = sum(l for op, l in sg if op in (CIG.M, CIG.D, CIG.N))
            di = sum(l for op, l in sg if op in (CIG.M, CIG.I))
            assert dj == sj1 - sj0 and di == si1 - si0
            j, i = sj1, si1
        assert j == n and i == len(y)

    def test_split_budget_survives_k_rounding(self):
        """Segment diagonal need, rounded UP in the dispatch layer's
        2048 steps, must still fit max_k — otherwise the split batch
        silently lands back on the XLA fallback it exists to avoid."""
        import numpy as np

        from nanopore_tpu.align.realign import split_window_pair
        from nanopore_tpu.io.sam import CIG

        rng = np.random.default_rng(1)
        n = 40000
        x = rng.integers(0, 4, n).astype(np.int8)
        y = x[50:39950].copy()
        guide = [(CIG.D, 50), (CIG.M, 39900), (CIG.D, 50)]
        for max_k in (10000, 12288, 16384):
            segs = split_window_pair(x, y, guide, max_k=max_k)
            assert len(segs) > 1
            for sj0, sj1, si0, si1, _sg in segs:
                need = (sj1 - sj0) + (si1 - si0)
                rounded = -(-need // 2048) * 2048
                assert rounded <= max_k, (max_k, need, rounded)

    def test_split_realign_matches_unsplit(self, monkeypatch, tmp_path):
        """Split realign produces the same cigars as the unsplit run
        (cuts land on anchors both lattices' paths pass through)."""
        import numpy as np

        from nanopore_tpu.align.model import PairHmmModel
        from nanopore_tpu.align.realign import realign_records
        from nanopore_tpu.io.encoding import decode
        from nanopore_tpu.io.sam import CIG, SamRecord, cigar_to_string

        rng = np.random.default_rng(3)
        n = 3000
        x = rng.integers(0, 4, n).astype(np.int8)
        ref = {"r": decode(x)}

        def make_records():
            recs = []
            for s, lead in enumerate((200, 900)):
                mlen = 1500
                y = x[lead : lead + mlen].copy()
                idx = rng.integers(0, mlen, 60)
                y[idx] = (y[idx] + 1) % 4
                recs.append(
                    SamRecord(
                        qname="q%d" % s, flag=0, rname="r", pos=0,
                        mapq=60,
                        cigar=[
                            (CIG.D, lead),
                            (CIG.M, mlen),
                            (CIG.D, n - lead - mlen),
                        ],
                        seq=decode(y),
                    )
                )
            return recs

        model = PairHmmModel.default()
        plain = make_records()
        realign_records(plain, ref, model, band_width=16)

        monkeypatch.setenv("NANOPORE_TPU_SPLIT_K", "1500")
        split = make_records()
        realign_records(split, ref, model, band_width=16)
        for a, b in zip(plain, split):
            assert cigar_to_string(a.cigar) == cigar_to_string(b.cigar)
