"""CLI subcommand tests (the reference's pipeline.sh / scripts surface)."""

import os

import numpy as np
import pytest

from nanopore_tpu.cli import main
from nanopore_tpu.io.encoding import decode
from nanopore_tpu.io.sam import SamReader, CIG
from nanopore_tpu.io.seqio import fasta_write, fastq_write
from nanopore_tpu.align.model import PairHmmModel


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(5)
    ref = decode(rng.integers(0, 4, 900).astype(np.int8))
    fa = str(tmp / "ref.fa")
    fasta_write(fa, "REF", ref)
    read = ref[100:700]
    fq = str(tmp / "reads.fq")
    with open(fq, "w") as fh:
        fastq_write(fh, "r1", read, [20] * len(read))
    return {"tmp": tmp, "fa": fa, "fq": fq, "ref": ref}


class TestCliCommands:
    def test_map(self, data):
        out = str(data["tmp"] / "map.sam")
        assert main(["map", data["fq"], data["fa"], out,
                     "--mapper", "LastParams"]) == 0
        recs = list(SamReader(out).mapped())
        assert recs and recs[0].qname == "r1"

    def test_chain(self, data):
        sam_in = str(data["tmp"] / "map.sam")
        out = str(data["tmp"] / "chained.sam")
        assert main(["chain", sam_in, data["fq"], data["fa"], out]) == 0
        [rec] = list(SamReader(out).mapped())
        assert rec.pos == 0
        assert sum(l for op, l in rec.cigar if op in (CIG.M, CIG.D)) == len(
            data["ref"]
        )

    def test_realign(self, data):
        sam_in = str(data["tmp"] / "chained.sam")
        out = str(data["tmp"] / "realigned.sam")
        assert main(["realign", sam_in, data["fq"], data["fa"], out]) == 0
        [rec] = list(SamReader(out).mapped())
        assert sum(l for op, l in rec.cigar if op in (CIG.M, CIG.I)) == 600

    def test_em(self, data):
        sam_in = str(data["tmp"] / "chained.sam")
        out = str(data["tmp"] / "hmm.txt")
        assert main(["em", sam_in, data["fa"], out,
                     "--trials", "1", "--iterations", "2"]) == 0
        model = PairHmmModel.load(out)
        np.testing.assert_allclose(model.transitions.sum(axis=1), 1.0,
                                   atol=1e-6)
        assert os.path.exists(out + ".xml")

    def test_modify_hmm(self, data):
        src = "nanopore_tpu/models/blasr_hmm_0.txt"
        out = str(data["tmp"] / "modified.txt")
        assert main(["modify-hmm", src, out, "--substitution-rate", "0.05",
                     "--flatten-indels"]) == 0
        m = PairHmmModel.load(out)
        np.testing.assert_allclose(m.emissions[1:], 1.0 / 16.0)
        rows = m.emissions[0].reshape(4, 4).sum(axis=1)
        np.testing.assert_allclose(rows, 0.25, atol=1e-9)

    def test_run_minimal(self, data, tmp_path):
        wd = tmp_path / "wd"
        os.makedirs(wd / "readFastqFiles" / "2d")
        os.makedirs(wd / "referenceFastaFiles")
        import shutil

        shutil.copy(data["fq"], wd / "readFastqFiles" / "2d" / "reads.fq")
        shutil.copy(data["fa"], wd / "referenceFastaFiles" / "ref.fa")
        assert main([
            "run", str(wd), "--mappers", "LastParamsChain",
            "--analyses", "Substitutions", "--meta-analyses", "",
            "--max-threads", "1",
        ]) == 0
        exp = (
            wd / "output" / "analysis_2d"
            / "experiment_reads.fq_ref.fa_LastParamsChain"
        )
        assert (exp / "mapping.sam").exists()
        assert (exp / "analysis_Substitutions" / "DONE").exists()
