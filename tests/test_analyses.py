"""Tests for the analyses layer: counters, reductions, full analyses."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from nanopore_tpu.analyses.stats_core import count_alignment, CoverageView
from nanopore_tpu.io.encoding import encode, decode, reverse_complement
from nanopore_tpu.io.sam import SamRecord, SamWriter, parse_cigar, CIG
from nanopore_tpu.io.seqio import fasta_write, fastq_write
from nanopore_tpu.ops.reductions import (
    substitution_counts,
    kmer_count_vector,
    revcomp_kmer_counts,
)


class TestStatsCore:
    def test_simple_counts(self):
        #        ref:  AACCGGTT
        #        read: AACGGGT  (cigar 3M 1D 3M1S with mismatch at read[3])
        ref = encode("AACCGGTT")
        rec = SamRecord(
            qname="r", flag=0, rname="ref", pos=0,
            cigar=parse_cigar("3M1D4M"), seq="AACTGTT",
        )
        c = count_alignment(rec, ref, read_len=7)
        # pairs: AAC vs AAC (3 match), then GGTT vs TGTT (1 mm + 3 match)
        assert c.matches == 6
        assert c.mismatches == 1
        assert c.ns == 0
        assert len(c.interior_del_lengths) == 1
        assert c.interior_del_lengths[0] == 1
        assert len(c.interior_ins_lengths) == 0

    def test_local_vs_global(self):
        ref = encode("A" * 30)
        rec = SamRecord(
            qname="r", flag=0, rname="ref", pos=5,
            cigar=parse_cigar("2S5M3I5M4S"), seq="A" * 19,
        )
        c = count_alignment(rec, ref, read_len=19)
        local = CoverageView(c, False)
        glob = CoverageView(c, True)
        assert local.total_ins_events == 1  # interior only
        assert local.total_ins_length == 3
        # global adds the 2 leading + 4 trailing soft-clipped read bases
        assert glob.total_ins_events == 3
        assert glob.total_ins_length == 9
        # global deletions: pos=5 leading + ref tail after aend
        assert glob.total_del_events == 2
        assert glob.total_del_length == 5 + (30 - rec.aend)

    def test_identity_formula(self):
        """identity = matches / (matches + mismatches + insertions)
        (coverage.py:72-73)."""
        ref = encode("ACGTACGTAC")
        rec = SamRecord(
            qname="r", flag=0, rname="ref", pos=0,
            cigar=parse_cigar("5M2I5M"), seq="ACGTAGGACGTA",
        )
        c = count_alignment(rec, ref, read_len=12)
        v = CoverageView(c, False)
        expected = c.matches / (c.matches + c.mismatches + 2)
        assert v.identity() == pytest.approx(expected)

    def test_block_lengths_exclude_last(self):
        ref = encode("A" * 40)
        rec = SamRecord(
            qname="r", flag=0, rname="ref", pos=0,
            cigar=parse_cigar("5M1D7M2I3M"), seq="A" * 17,
        )
        c = count_alignment(rec, ref, read_len=17)
        # blocks recorded only when followed by an indel: [5, 7], not 3
        assert c.block_lengths.tolist() == [5, 7]

    def test_mixed_gap_collapses_to_one_event(self):
        """I and D runs between the same two match runs are ONE insertion
        event and ONE deletion event (utils.py:113-134 semantics)."""
        ref = encode("A" * 30)
        rec = SamRecord(
            qname="r", flag=0, rname="ref", pos=0,
            cigar=parse_cigar("5M2I3D1I5M"), seq="A" * 13,
        )
        c = count_alignment(rec, ref, read_len=13)
        assert len(c.interior_ins_lengths) == 1
        assert c.interior_ins_lengths[0] == 3  # 2 + 1
        assert len(c.interior_del_lengths) == 1
        assert c.interior_del_lengths[0] == 3


class TestReductions:
    def test_substitution_counts(self):
        ref = np.array([0, 1, 2, 3, 4], np.int8)
        read = np.array([0, 1, 3, 3, 0], np.int8)
        m = np.asarray(substitution_counts(ref, read))
        assert m[0, 0] == 1 and m[1, 1] == 1 and m[3, 3] == 1
        assert m[2, 3] == 1  # G->T substitution
        assert m[4, 0] == 1  # N ref vs A read
        assert m.sum() == 5

    def test_kmer_count_vector_reference_window_quirk(self):
        # "ACGTA" with k=2: reference counts windows ending at i in
        # [k, len) -> AC, CG, GT but NOT the final TA
        counts = np.asarray(kmer_count_vector(encode("ACGTA"), 2))
        assert counts[0 * 4 + 1] == 1  # AC
        assert counts[1 * 4 + 2] == 1  # CG
        assert counts[2 * 4 + 3] == 1  # GT
        assert counts[3 * 4 + 0] == 0  # TA skipped (final window)
        assert counts.sum() == 3

    def test_kmer_n_excluded(self):
        counts = np.asarray(kmer_count_vector(encode("ACNGT"), 2))
        assert counts.sum() == 1  # only AC valid (CN, NG invalid; GT final)

    def test_revcomp_permutation(self):
        counts = np.zeros(16, np.int64)
        counts[0 * 4 + 1] = 7  # AC
        rc = revcomp_kmer_counts(counts, 2)
        assert rc[2 * 4 + 3] == 7  # revcomp(AC) = GT


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    """A tiny mapped experiment: ref + reads + mapping.sam via the engine."""
    from nanopore_tpu.mapping.engine import MappingEngine, MapperConfig

    tmp = tmp_path_factory.mktemp("exp")
    rng = np.random.default_rng(11)
    ref = decode(rng.integers(0, 4, 1200).astype(np.int8))
    fa = str(tmp / "ref.fa")
    fasta_write(fa, "REF1", ref)

    def noisy(seq):
        out = []
        for ch in seq:
            r = rng.random()
            if r < 0.04:
                continue
            if r < 0.08:
                out.append("ACGT"[rng.integers(0, 4)])
            out.append(ch if rng.random() > 0.05 else "ACGT"[rng.integers(0, 4)])
        return "".join(out)

    reads = {
        "channel_3_read_1": noisy(ref[100:600]),
        "channel_7_read_2": reverse_complement(noisy(ref[400:1000])),
        "channel_9_read_3": decode(rng.integers(0, 4, 300).astype(np.int8)),
    }
    fq = str(tmp / "reads.fq")
    with open(fq, "w") as fh:
        for name, seq in reads.items():
            fastq_write(fh, name, seq, [20] * len(seq))

    sam = str(tmp / "mapping.sam")
    engine = MappingEngine({"REF1": ref}, MapperConfig())
    engine.map_fastq(fq, sam)
    return {"fa": fa, "fq": fq, "sam": sam, "tmp": tmp, "ref": ref}


def run_analysis(cls, experiment, name):
    outdir = str(experiment["tmp"] / ("analysis_" + name))
    os.makedirs(outdir, exist_ok=True)
    a = cls(experiment["fq"], "2d", experiment["fa"], experiment["sam"], outdir)
    a.execute()
    assert cls.is_finished(outdir)
    return outdir


class TestAnalysesEndToEnd:
    def test_substitutions(self, experiment):
        from nanopore_tpu.analyses import Substitutions

        outdir = run_analysis(Substitutions, experiment, "subst")
        root = ET.parse(os.path.join(outdir, "substitutions.xml")).getroot()
        assert root.tag == "substitutions"
        identity = float(root.attrib["identity"])
        assert 0.8 < identity <= 1.0  # ~5% substitution noise
        # 5 per-base child nodes, each with 5 read-base children
        assert [child.tag for child in root] == list("ACGTN")
        with open(os.path.join(outdir, "subst.tsv")) as fh:
            lines = fh.read().strip().split("\n")
        assert lines[0] == "A\tC\tG\tT"
        assert len(lines) == 5

    def test_coverage_local_and_global(self, experiment):
        from nanopore_tpu.analyses import LocalCoverage, GlobalCoverage

        out_local = run_analysis(LocalCoverage, experiment, "cov_local")
        out_global = run_analysis(GlobalCoverage, experiment, "cov_global")
        for outdir in (out_local, out_global):
            for name in ("coverage_all", "coverage_bestPerRead"):
                root = ET.parse(os.path.join(outdir, name + ".xml")).getroot()
                assert root.tag == name
                assert int(root.attrib["numberOfReadAlignments"]) >= 2
                assert root.attrib["distributionidentity"]
                assert len(root.findall("readAlignmentCoverage")) >= 2
        # unmapped read accounted
        root = ET.parse(
            os.path.join(out_local, "coverage_bestPerRead.xml")
        ).getroot()
        assert int(root.attrib["numberOfUnmappedReads"]) >= 1

    def test_indels(self, experiment):
        from nanopore_tpu.analyses import Indels

        outdir = run_analysis(Indels, experiment, "indels")
        root = ET.parse(os.path.join(outdir, "indels.xml")).getroot()
        assert root.tag == "indels"
        assert int(root.attrib["numberOfReadAlignments"]) >= 2
        assert os.path.exists(os.path.join(outdir, "indels.tsv"))

    def test_kmer(self, experiment):
        from nanopore_tpu.analyses import KmerAnalysis

        outdir = run_analysis(KmerAnalysis, experiment, "kmer")
        table = os.path.join(outdir, "all_bases_kmer_counts.txt")
        with open(table) as fh:
            lines = fh.read().strip().split("\n")
        assert len(lines) == 4**5 + 1  # header + 1024 kmers
        assert lines[0].startswith("kmer\trefCount")
        assert os.path.exists(
            os.path.join(outdir, "all_bases_pval_kmer_counts.txt")
        )

    def test_indel_kmer(self, experiment):
        from nanopore_tpu.analyses import IndelKmerAnalysis

        outdir = run_analysis(IndelKmerAnalysis, experiment, "indelkmer")
        table = os.path.join(outdir, "indel_bases_kmer_counts.txt")
        assert os.path.exists(table)

    def test_channel_mappability(self, experiment):
        from nanopore_tpu.analyses import ChannelMappability

        outdir = run_analysis(ChannelMappability, experiment, "channel")
        tsv = os.path.join(outdir, "channel_mappability.tsv")
        with open(tsv) as fh:
            lines = fh.read().strip().split("\n")
        assert lines[0] == "Channel\tReadCount\tMappableReadCount"
        rows = {int(l.split("\t")[0]): l.split("\t") for l in lines[1:]}
        assert rows[3][1] == "1"  # channel_3 has one read
        assert len(lines) >= 513

    def test_alignment_uncertainty(self, experiment):
        from nanopore_tpu.analyses import AlignmentUncertainty

        outdir = run_analysis(AlignmentUncertainty, experiment, "uncert")
        root = ET.parse(
            os.path.join(outdir, "alignmentUncertainty.xml")
        ).getroot()
        avg = float(root.attrib["averagePosteriorMatchProbability"])
        assert 0.3 < avg <= 1.0

    def test_consensus(self, experiment):
        from nanopore_tpu.analyses import Consensus
        from nanopore_tpu.io.seqio import fastq_read

        outdir = run_analysis(Consensus, experiment, "consensus")
        [(name, seq, quals)] = list(
            fastq_read(os.path.join(outdir, "consensus.fastq"))
        )
        assert name == "REF1_consensus"
        assert len(seq) == len(experiment["ref"])
        # covered region should reconstruct the reference well
        region = slice(150, 550)
        same = sum(
            1 for a, b in zip(seq[region], experiment["ref"][region]) if a == b
        )
        assert same > 0.9 * (region.stop - region.start)

    def test_fastqc_native(self, experiment):
        from nanopore_tpu.analyses import FastQC

        outdir = run_analysis(FastQC, experiment, "fastqc")
        summary = os.path.join(outdir, "fastqc_summary.txt")
        if os.path.exists(summary):  # native fallback path
            with open(summary) as fh:
                assert "reads\t3" in fh.read()


class TestVennCounts:
    """vennCounts semantics (vennDiagram.R:63-100)."""

    def test_region_counts_and_ordering(self):
        from nanopore_tpu.analyses.plots import venn_counts

        sets = {
            "A": {"r1", "r2", "r3"},
            "B": {"r2", "r4"},
            "C": {"r3", "r4", "r5"},
        }
        universe = {"r1", "r2", "r3", "r4", "r5", "r6"}
        rows = venn_counts(sets, universe)
        assert len(rows) == 8
        got = dict(rows)
        # membership tuples follow set order (A, B, C); counts follow
        # R's table() linearisation (last set's bit fastest)
        assert rows[0][0] == (0, 0, 0) and rows[0][1] == 1  # r6
        assert rows[1][0] == (0, 0, 1) and rows[1][1] == 1  # r5
        assert got[(1, 0, 0)] == 1  # r1
        assert got[(1, 1, 0)] == 1  # r2
        assert got[(1, 0, 1)] == 1  # r3
        assert got[(0, 1, 1)] == 1  # r4
        assert got[(1, 1, 1)] == 0
        assert sum(c for _, c in rows) == 6

    def test_venn_plot_four_sets_writes_pdf(self, tmp_path):
        from nanopore_tpu.analyses.plots import venn_plot

        rng = np.random.default_rng(0)
        names = ["Bwa", "Last", "Lastz", "Blasr"]
        reads = ["read%d" % i for i in range(100)]
        sets = {
            n: {r for r in reads if rng.random() < 0.5} for n in names
        }
        pdf = str(tmp_path / "venn.pdf")
        venn_plot(sets, pdf, universe=set(reads))
        assert os.path.getsize(pdf) > 1000


class TestResampledKs:
    """kmer_analysis.R:16-36 statistic."""

    def test_identical_distributions_not_significant(self):
        from nanopore_tpu.analyses.plots import resampled_ks_pvalues

        frac = np.full(64, 1.0 / 64)
        p = resampled_ks_pvalues(frac, frac, num_trials=200)
        # Bonferroni-adjusted identical distributions: nothing significant
        assert (np.minimum(1.0, p * 64) > 0.05).all()

    def test_shifted_kmer_detected(self):
        from nanopore_tpu.analyses.plots import resampled_ks_pvalues

        ref = np.full(64, 1.0 / 64)
        read = ref.copy()
        read[0] *= 8.0
        read /= read.sum()
        p = resampled_ks_pvalues(ref, read, num_trials=200)
        assert p[0] * 64 < 0.05
        # and the enriched k-mer is among the most significant
        assert p[0] <= np.partition(p, 3)[3]
