"""End-to-end test of the MarginAlign SNP caller on a mutated reference."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from nanopore_tpu.analyses.snp_caller import (
    MarginAlignSnpCaller,
    calc_base_posterior_probs,
    get_jukes_cantor_matrix,
    get_null_substitution_matrix,
)
from nanopore_tpu.io.encoding import decode
from nanopore_tpu.io.seqio import fasta_write, fastq_write


class TestCalcBasePosteriorProbs:
    def test_strong_consensus_calls_alt(self):
        # every observation says C while the (mutated) ref says A
        obs = np.zeros((1, 4))
        obs[0, 1] = 1.0
        post = calc_base_posterior_probs(
            obs, np.array([0]), get_null_substitution_matrix(),
            get_jukes_cantor_matrix(),
        )
        assert post.shape == (1, 4)
        np.testing.assert_allclose(post.sum(axis=1), 1.0)
        # observations are normalised (one effective observation, like the
        # reference's expectations/totalExpectation): posterior C =
        # 0.8/(0.8+3*0.2/3) = 0.8
        assert post[0, 1] == pytest.approx(0.8)
        assert post[0].argmax() == 1

    def test_uniform_observations_stay_flat(self):
        obs = np.full((1, 4), 0.25)
        post = calc_base_posterior_probs(
            obs, np.array([2]), get_null_substitution_matrix(),
            get_jukes_cantor_matrix(),
        )
        np.testing.assert_allclose(post[0], 0.25, atol=1e-9)


@pytest.fixture(scope="module")
def snp_experiment(tmp_path_factory):
    """Reads from the TRUE reference mapped against a mutated reference."""
    from nanopore_tpu.mapping.engine import MappingEngine, MapperConfig
    from nanopore_tpu.align.chain_sam import chain_sam_file

    tmp = tmp_path_factory.mktemp("snp")
    rng = np.random.default_rng(33)
    true_ref = decode(rng.integers(0, 4, 600).astype(np.int8))
    # mutate ~3% of positions
    codes = np.frombuffer(true_ref.encode(), np.uint8).copy()
    mutated = list(true_ref)
    n_mut = 0
    for i in range(len(true_ref)):
        if rng.random() < 0.03:
            alt = "ACGT"[rng.integers(0, 4)]
            if alt != true_ref[i]:
                mutated[i] = alt
                n_mut += 1
    mutated_ref = "".join(mutated)
    assert n_mut > 5

    fa = str(tmp / "ref.fa")
    fasta_write(fa, "REF", mutated_ref)
    # truth index pairing name and name_mutated (mutate_reference.py:14-37)
    with open(fa + "_Index.txt", "w") as fh:
        fasta_write(fh, "REF", true_ref)
        fasta_write(fh, "REF_mutated", mutated_ref)

    def noisy(seq):
        out = []
        for ch in seq:
            r = rng.random()
            if r < 0.02:
                continue
            if r < 0.04:
                out.append("ACGT"[rng.integers(0, 4)])
            out.append(ch if rng.random() > 0.03 else "ACGT"[rng.integers(0, 4)])
        return "".join(out)

    fq = str(tmp / "reads.fq")
    with open(fq, "w") as fh:
        for i in range(6):  # ~6x coverage from the TRUE sequence
            fastq_write(fh, "read_%d" % i, noisy(true_ref), None)

    raw_sam = str(tmp / "raw.sam")
    engine = MappingEngine({"REF": mutated_ref}, MapperConfig())
    engine.map_fastq(fq, raw_sam)
    sam = str(tmp / "mapping.sam")
    chain_sam_file(raw_sam, sam, fq, fa)
    return {"fa": fa, "fq": fq, "sam": sam, "tmp": tmp, "n_mut": n_mut}


class TestMarginAlignSnpCaller(object):
    def test_calls_injected_snps(self, snp_experiment):
        outdir = str(snp_experiment["tmp"] / "analysis_snp")
        os.makedirs(outdir, exist_ok=True)
        analysis = MarginAlignSnpCaller(
            snp_experiment["fq"], "2d", snp_experiment["fa"],
            snp_experiment["sam"], outdir,
        )
        analysis.execute()
        root = ET.parse(
            os.path.join(outdir, "marginaliseConsensus.xml")
        ).getroot()
        assert root.tag == "marginAlignComparison"
        # 4 call sets x 4 hmm types x (1 + 4*3) combos
        nodes = list(root)
        assert len(nodes) == 4 * 4 * (1 + 4 * 3)
        # at full coverage the marginAlign caller should recover SNPs well
        best = {}
        for node in nodes:
            if node.attrib["coverage"] == "1000000":
                best[node.tag] = float(node.attrib["fScore"])
        assert len(best) == 16
        top = max(best.values())
        assert top > 0.5, best
        # sanity attributes
        node = nodes[0]
        assert int(node.attrib["totalHeldOut"]) == snp_experiment["n_mut"]
        assert float(node.attrib["actualCoverage"]) > 1.0
        assert len(node.attrib["recallByProbability"].split()) == 101


class TestAnchorSplitPosteriors:
    def test_split_matches_unsplit(self, snp_experiment, monkeypatch,
                                   tmp_path):
        """Over-budget windows anchor-split; segment posterior
        expectations scatter into the same full-ref matrices as the
        unsplit run (cut cells may move a little posterior mass across
        the anchor — bounded below)."""
        from nanopore_tpu.align.model import PairHmmModel
        from nanopore_tpu.analyses.common import ExperimentData

        data = ExperimentData(
            snp_experiment["fq"], snp_experiment["fa"],
            snp_experiment["sam"],
        )
        analysis = MarginAlignSnpCaller(
            snp_experiment["fq"], "2d", snp_experiment["fa"],
            snp_experiment["sam"], str(tmp_path),
        )
        model = PairHmmModel.default()
        plain = analysis._posteriors_for_hmm(data, model)
        monkeypatch.setenv("NANOPORE_TPU_SPLIT_K", "700")
        split = analysis._posteriors_for_hmm(data, model)
        assert len(plain) == len(split)
        for a, b in zip(plain, split):
            assert a.shape == b.shape
            diff = np.abs(a - b)
            # total expectation mass agrees and large deviations are
            # confined to a handful of cut-adjacent positions
            assert abs(a.sum() - b.sum()) < 0.05 * max(a.sum(), 1.0)
            assert (diff.max(axis=1) > 0.05).sum() <= 10
