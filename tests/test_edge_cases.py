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
