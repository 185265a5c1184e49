"""Unit tests for the host I/O layer (encoding, seqio, sam, cigar, hmm)."""

import io
import os

import numpy as np
import pytest

from nanopore_tpu.io import (
    encode,
    decode,
    reverse_complement,
    revcomp_codes,
    fasta_read,
    fasta_write,
    fastq_read,
    fastq_write,
    read_fasta_dict,
    read_fastq_dict,
    make_fasta_names_unique,
    make_fastq_names_unique,
    normalise_qual_values,
    SamRecord,
    SamReader,
    SamWriter,
    CIG,
)
from nanopore_tpu.io.sam import parse_cigar, cigar_to_string
from nanopore_tpu.io.cigar import (
    exonerate_cigar_string,
    parse_exonerate_cigar,
)
from nanopore_tpu.align.model import PairHmmModel


class TestEncoding:
    def test_roundtrip(self):
        s = "ACGTNacgtnX"
        codes = encode(s)
        assert codes.tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 4]
        assert decode(codes) == "ACGTNACGTNN"

    def test_revcomp(self):
        assert reverse_complement("ACGTN") == "NACGT"
        assert reverse_complement("acgt") == "acgt"
        assert decode(revcomp_codes(encode("AACGT"))) == "ACGTT"

    def test_revcomp_involution(self):
        s = "ACCGTTGANNTA"
        assert reverse_complement(reverse_complement(s)) == s


class TestSeqIO:
    def test_fasta_roundtrip(self, tmp_path):
        p = str(tmp_path / "x.fa")
        fasta_write(p, "seq1 extra words", "ACGT" * 40)
        [(name, seq)] = list(fasta_read(p))
        assert name == "seq1 extra words"
        assert seq == "ACGT" * 40
        assert read_fasta_dict(p) == {"seq1": "ACGT" * 40}

    def test_fastq_roundtrip(self, tmp_path):
        p = str(tmp_path / "x.fq")
        with open(p, "w") as fh:
            fastq_write(fh, "read1", "ACGT", [2, 3, 4, 5])
            fastq_write(fh, "read2", "GG", None)
        recs = list(fastq_read(p))
        assert recs[0] == ("read1", "ACGT", [2, 3, 4, 5])
        assert recs[1] == ("read2", "GG", None)
        assert read_fastq_dict(p) == {"read1": "ACGT", "read2": "GG"}

    def test_uniquify_fastq(self, tmp_path):
        src = str(tmp_path / "in.fq")
        with open(src, "w") as fh:
            fastq_write(fh, "r1 descr", "AC", [1, 1])
            fastq_write(fh, "r1", "GG", [1, 1])
            fastq_write(fh, "r1i", "TT", [1, 1])
        out = str(tmp_path / "out.fq")
        make_fastq_names_unique(src, out)
        names = [n for n, _, _ in fastq_read(out)]
        # 'r1 descr' -> 'r1'; second 'r1' -> 'r1i'; 'r1i' -> 'r1ii'
        assert names == ["r1", "r1i", "r1ii"]

    def test_normalise_quals(self, tmp_path):
        src = str(tmp_path / "in.fq")
        with open(src, "w") as fh:
            fastq_write(fh, "r1", "ACG", None)
        out = str(tmp_path / "out.fq")
        normalise_qual_values(src, out)
        [(_, _, quals)] = list(fastq_read(out))
        assert quals == [33, 33, 33]

    def test_reference_data_loads(self, reference_test_data):
        reads = read_fastq_dict(reference_test_data["reads"])
        refs = read_fasta_dict(reference_test_data["ref"])
        assert len(reads) == 2
        assert list(refs) == ["HUMAN"]
        assert len(refs["HUMAN"]) > 30000


class TestSam:
    def make_record(self):
        return SamRecord(
            qname="r1",
            flag=0,
            rname="chr1",
            pos=10,
            mapq=30,
            cigar=parse_cigar("2S3M1I2M2D1M3S"),
            seq="TTACGGACAGAAA",
            qual="*",
        )

    def test_cigar_codec(self):
        assert cigar_to_string(parse_cigar("3M1I2D")) == "3M1I2D"
        assert parse_cigar("*") == []
        assert cigar_to_string([]) == "*"

    def test_derived_coords(self):
        rec = self.make_record()
        assert rec.qstart == 2
        assert rec.qend == 10
        assert rec.query == "ACGGACAG"
        assert rec.aend == 10 + 3 + 2 + 2 + 1  # M3 M2 D2 M1 consume ref
        assert not rec.is_reverse
        assert not rec.is_unmapped

    def test_aligned_pairs(self):
        rec = self.make_record()
        pairs = rec.aligned_pairs
        # 3M: (0,10),(1,11),(2,12); 1I: (3,None); 2M: (4,13),(5,14);
        # 2D: (None,15),(None,16); 1M: (6,17)
        assert pairs == [
            (0, 10), (1, 11), (2, 12),
            (3, None),
            (4, 13), (5, 14),
            (None, 15), (None, 16),
            (6, 17),
        ]
        read_pos, ref_pos = rec.aligned_pair_arrays()
        expect = [(q, r) for q, r in pairs if q is not None and r is not None]
        assert list(zip(read_pos.tolist(), ref_pos.tolist())) == expect

    def test_sam_file_roundtrip(self, tmp_path):
        p = str(tmp_path / "x.sam")
        rec = self.make_record()
        rec.tags = [("AS", "i", 42)]
        with SamWriter(p, {"chr1": 1000}) as w:
            w.write(rec)
        reader = SamReader(p)
        assert reader.references == ["chr1"]
        assert reader.reference_lengths["chr1"] == 1000
        [got] = list(reader)
        assert got.qname == "r1"
        assert got.pos == 10
        assert got.cigar == rec.cigar
        assert got.tags == [("AS", "i", 42)]
        assert list(reader.mapped()) == [got]

    def test_unmapped_filter(self, tmp_path):
        p = str(tmp_path / "x.sam")
        with SamWriter(p, {"chr1": 100}) as w:
            w.write(SamRecord(qname="u1"))  # unmapped default
            w.write(
                SamRecord(
                    qname="m1", flag=0, rname="chr1", pos=0,
                    cigar=parse_cigar("2M"), seq="AC",
                )
            )
        assert [r.qname for r in SamReader(p).mapped()] == ["m1"]


class TestExonerateCigar:
    def test_roundtrip(self):
        rec = SamRecord(
            qname="r1", flag=0, rname="ref", pos=5,
            cigar=parse_cigar("2S3M1I2M"), seq="TTACGGAC",
        )
        line = exonerate_cigar_string(rec)
        ec = parse_exonerate_cigar(line)
        assert ec.qname == "r1"
        assert (ec.qstart, ec.qend, ec.qstrand) == (0, 6, "+")
        assert (ec.tname, ec.tstart, ec.tend, ec.tstrand) == ("ref", 5, 10, "+")
        assert ec.ops == [(CIG.M, 3), (CIG.I, 1), (CIG.M, 2)]
        assert ec.match_length == 5


class TestHmmModel:
    REF_HMM = "/root/reference/nanopore/mappers/blasr_hmm_0.txt"

    def test_load_reference_model(self):
        if not os.path.exists(self.REF_HMM):
            pytest.skip("reference hmm not mounted")
        m = PairHmmModel.load(self.REF_HMM)
        assert m.transitions.shape == (5, 5)
        assert m.emissions.shape == (5, 16)
        np.testing.assert_allclose(m.transitions.sum(axis=1), 1.0, atol=1e-9)
        np.testing.assert_allclose(m.emissions[1:].sum(axis=1), 1.0, atol=1e-9)
        assert m.likelihood < 0

    def test_write_load_roundtrip(self, tmp_path):
        m = PairHmmModel.default()
        m.likelihood = -123.5
        p = str(tmp_path / "hmm.txt")
        m.write(p)
        m2 = PairHmmModel.load(p)
        np.testing.assert_array_equal(m.transitions, m2.transitions)
        np.testing.assert_array_equal(m.emissions, m2.emissions)
        assert m2.likelihood == -123.5

    def test_flat_indels(self):
        m = PairHmmModel.default()
        m.emissions[1:] = np.random.default_rng(0).random((4, 16))
        m.set_indel_emissions_flat()
        np.testing.assert_allclose(m.emissions[1:], 1.0 / 16.0)

    def test_gc_normalisation(self):
        m = PairHmmModel.default()
        m.normalise_by_reference_gc_content(0.5)
        for state in (0, 1, 3):  # match + delete states
            rows = m.emissions[state].reshape(4, 4).sum(axis=1)
            np.testing.assert_allclose(rows, 0.25, atol=1e-12)
        # insert states untouched (still flat 1/16)
        np.testing.assert_allclose(m.emissions[2], 1.0 / 16.0)

    def test_variation_rate_preserves_mass(self):
        m = PairHmmModel.default()
        before = m.emissions[0].sum()
        m.modify_emissions_by_expected_variation_rate(0.2)
        np.testing.assert_allclose(m.emissions[0].sum(), before, atol=1e-12)

    def test_error_substitution_matrix(self):
        m = PairHmmModel.default()
        s = m.error_substitution_matrix()
        np.testing.assert_allclose(s.sum(axis=1), 1.0, atol=1e-12)
        assert (np.diag(s) > 0.5).all()

    def test_xml_flavour(self, tmp_path):
        import xml.etree.ElementTree as ET

        m = PairHmmModel.default()
        m.running_likelihoods = [[-10.0, -5.0], [-9.0, -4.0]]
        p = str(tmp_path / "hmm.txt.xml")
        m.write_xml(p)
        root = ET.parse(p).getroot()
        assert len(root.findall("transition")) == 25
        assert len(root.findall("emission")) == 80
        trials = root.findall("hmm")
        assert len(trials) == 2
        assert trials[0].attrib["runningLikelihoods"] == "-10.0 -5.0"
        # schema consumed by reference analyses/hmm.py:31-47
        t0 = root.findall("transition")[0]
        assert set(t0.attrib) == {"from", "to", "avg", "std"}
        e0 = root.findall("emission")[0]
        assert set(e0.attrib) == {"state", "x", "y", "avg", "std"}
