"""Native BAM/BGZF/BAI codec tests (io/bam.py).

Validates (1) BGZF conformance against Python's stock gzip decoder —
BGZF is a valid multi-member gzip stream, so ``gzip.decompress`` must
reproduce the raw payload; (2) SAM<->BAM record round-trips; (3) BAI
structure (magic, bin numbering, linear-index windows); (4) the
sam_to_sorted_bam convenience matching samtools sort semantics.
"""

import gzip
import random
import struct

import pytest

from nanopore_tpu.io.bam import (
    BamReader,
    BamWriter,
    BgzfReader,
    BgzfWriter,
    bam_records,
    decode_bam_record,
    encode_bam_record,
    reg2bin,
    sam_to_sorted_bam,
)
from nanopore_tpu.io.sam import SamReader, SamRecord, SamWriter, parse_cigar


def make_record(qname="r1", pos=10):
    return SamRecord(
        qname=qname,
        flag=0,
        rname="chr1",
        pos=pos,
        mapq=30,
        cigar=parse_cigar("2S3M1I2M2D1M3S"),
        seq="TTACGGACAGAAA",
        qual="IIIIIIIIIIIII",
        tags=[("AS", "i", 42), ("XN", "Z", "hello"), ("XF", "f", 0.5)],
    )


class TestBgzf:
    def test_gzip_conformance(self, tmp_path):
        p = str(tmp_path / "x.bgzf")
        payload = bytes(random.Random(0).randbytes(200_000))
        with BgzfWriter(p) as w:
            w.write(payload)
        # stock gzip must decode the whole multi-member stream
        with open(p, "rb") as fh:
            assert gzip.decompress(fh.read()) == payload

    def test_reader_roundtrip_and_blocks(self, tmp_path):
        p = str(tmp_path / "x.bgzf")
        payload = bytes(random.Random(1).randbytes(150_000))
        with BgzfWriter(p) as w:
            w.write(payload[:70_000])
            w.write(payload[70_000:])
        r = BgzfReader(p)
        assert r.read(len(payload) + 10) == payload
        r.close()

    def test_virtual_offsets(self, tmp_path):
        p = str(tmp_path / "x.bgzf")
        w = BgzfWriter(p)
        offsets = []
        chunks = [b"a" * 40_000, b"b" * 40_000, b"c" * 123]
        for c in chunks:
            offsets.append(w.tell_virtual())
            w.write(c)
        w.close()
        r = BgzfReader(p)
        for off, c in zip(offsets, chunks):
            r.seek_virtual(off)
            assert r.read(len(c)) == c
        r.close()

    def test_eof_marker(self, tmp_path):
        p = str(tmp_path / "x.bgzf")
        with BgzfWriter(p) as w:
            w.write(b"data")
        with open(p, "rb") as fh:
            blob = fh.read()
        assert blob.endswith(
            bytes.fromhex("1f8b08040000000000ff0600424302001b0003"
                          "000000000000000000")
        )


class TestBamRecord:
    def test_roundtrip(self):
        rec = make_record()
        body = encode_bam_record(rec, {"chr1": 0})
        got = decode_bam_record(body, ["chr1"])
        assert got.qname == rec.qname
        assert got.flag == rec.flag
        assert got.rname == "chr1"
        assert got.pos == rec.pos
        assert got.mapq == rec.mapq
        assert got.cigar == rec.cigar
        assert got.seq == rec.seq
        assert got.qual == rec.qual
        assert got.tags[:2] == rec.tags[:2]
        assert got.tags[2][0] == "XF" and abs(got.tags[2][2] - 0.5) < 1e-7

    def test_unmapped_and_missing_qual(self):
        rec = SamRecord(qname="u1", seq="ACGT", qual="*")
        body = encode_bam_record(rec, {})
        got = decode_bam_record(body, [])
        assert got.is_unmapped and got.rname == "*"
        assert got.seq == "ACGT" and got.qual == "*"

    def test_reg2bin(self):
        # values from the SAM-spec binning scheme
        assert reg2bin(0, 1) == 4681
        assert reg2bin(0, 1 << 14) == 4681
        assert reg2bin(0, (1 << 14) + 1) == 585
        assert reg2bin(0, 1 << 29) == 0


class TestBamFile:
    def test_file_roundtrip(self, tmp_path):
        p = str(tmp_path / "x.bam")
        recs = [make_record("r%d" % i, pos=i * 7) for i in range(50)]
        with BamWriter(p, {"chr1": 100000}) as w:
            for r in recs:
                w.write(r)
        with BamReader(p) as br:
            assert br.references == ["chr1"]
            assert br.reference_lengths["chr1"] == 100000
            got = list(br)
        assert [g.qname for g in got] == [r.qname for r in recs]
        assert [g.pos for g in got] == [r.pos for r in recs]
        assert all(g.cigar == r.cigar for g, r in zip(got, recs))

    def test_sorted_bam_and_index(self, tmp_path):
        sam = str(tmp_path / "x.sam")
        with SamWriter(sam, {"chr1": 100000}) as w:
            for i in [5, 3, 9, 1]:
                w.write(make_record("r%d" % i, pos=i * 1000))
            w.write(SamRecord(qname="un", seq="AC", qual="*"))
        bam = str(tmp_path / "x.bam")
        sam_to_sorted_bam(sam, bam)
        got = bam_records(bam)
        mapped = [g for g in got if not g.is_unmapped]
        assert [g.pos for g in mapped] == sorted(g.pos for g in mapped)
        # index structure
        with open(bam + ".bai", "rb") as fh:
            blob = fh.read()
        assert blob[:4] == b"BAI\x01"
        (n_ref,) = struct.unpack("<i", blob[4:8])
        assert n_ref == 1
        (n_bin,) = struct.unpack("<i", blob[8:12])
        assert n_bin >= 1
        # walk bins, then check linear index has ceil(maxend/16kb) windows
        off = 12
        for _ in range(n_bin):
            b, n_chunk = struct.unpack("<Ii", blob[off : off + 8])
            assert 0 <= b <= 37449
            off += 8 + 16 * n_chunk
        (n_intv,) = struct.unpack("<i", blob[off : off + 4])
        assert n_intv == 1  # all records in the first 16 kb window

    def test_bai_linear_windows_spanning(self, tmp_path):
        p = str(tmp_path / "x.bam")
        with BamWriter(p, {"chr1": 1 << 20}) as w:
            w.write(make_record("far", pos=100_000))
            w.write_index(p + ".bai")
        with open(p + ".bai", "rb") as fh:
            blob = fh.read()
        # magic(4) n_ref(4) n_bin(4) [bin(4) n_chunk(4) chunk(16)] n_intv(4)
        (n_bin,) = struct.unpack("<i", blob[8:12])
        assert n_bin == 1
        (n_chunk,) = struct.unpack("<i", blob[16:20])
        assert n_chunk == 1
        (n_intv,) = struct.unpack("<i", blob[36:40])
        # record at 100k lies in 16 kb window index 100000>>14 = 6
        assert n_intv == 7

    def test_header_text_preserved(self, tmp_path):
        sam = str(tmp_path / "x.sam")
        with SamWriter(sam, {"chr1": 500}) as w:
            w.write(make_record())
        bam = str(tmp_path / "x.bam")
        sam_to_sorted_bam(sam, bam)
        with BamReader(bam) as br:
            assert "SO:coordinate" in br.header_text
            assert "SN:chr1" in br.header_text


class TestAssemblyHubBam:
    def test_hub_emits_bam_tracks(self, tmp_path):
        # minimal experiment layout for CustomTrackAssemblyHub
        from nanopore_tpu.pipeline import Experiment
        from nanopore_tpu.meta.assembly_hub import CustomTrackAssemblyHub

        ref = str(tmp_path / "ref.fa")
        with open(ref, "w") as fh:
            fh.write(">chr1\n" + "ACGT" * 100 + "\n")
        fq = str(tmp_path / "reads.fq")
        with open(fq, "w") as fh:
            fh.write("@r1\nACGTACGT\n+\nIIIIIIII\n")
        exp_dir = str(tmp_path / "experiment_reads_ref_Demo")
        import os

        os.makedirs(exp_dir)
        with SamWriter(os.path.join(exp_dir, "mapping.sam"), {"chr1": 400}) as w:
            w.write(
                SamRecord(qname="r1", flag=0, rname="chr1", pos=0,
                          cigar=parse_cigar("8M"), seq="ACGTACGT",
                          qual="IIIIIIII")
            )
        out = str(tmp_path / "meta")
        os.makedirs(out)
        exp = Experiment(
            read_fastq_file=fq, read_type="fake", reference_fasta_file=ref,
            mapper_name="Demo", experiment_dir=exp_dir,
        )
        CustomTrackAssemblyHub(out, [exp], []).run()
        genome_dir = os.path.join(out, "hub_ref", "ref")
        track_bam = os.path.join(genome_dir, "experiment_reads_ref_Demo.bam")
        assert os.path.exists(track_bam)
        assert os.path.exists(track_bam + ".bai")
        [rec] = bam_records(track_bam)
        assert rec.qname == "r1" and rec.rname == "chr1"
        with open(os.path.join(genome_dir, "trackDb.txt")) as fh:
            assert ".bam" in fh.read()


class TestCliBam:
    def test_sam2bam_bam2sam_roundtrip(self, tmp_path, capsys):
        from nanopore_tpu.cli import main as cli_main
        from nanopore_tpu.io.sam import sam_records

        sam = str(tmp_path / "x.sam")
        with SamWriter(sam, {"chr1": 100000}) as w:
            for i in [4, 2, 8]:
                w.write(make_record("r%d" % i, pos=i * 100))
        bam = str(tmp_path / "x.bam")
        assert cli_main(["sam2bam", sam, "-o", bam]) == 0
        import os
        assert os.path.exists(bam) and os.path.exists(bam + ".bai")
        sam2 = str(tmp_path / "back.sam")
        assert cli_main(["bam2sam", bam, "-o", sam2]) == 0
        got = sam_records(sam2)
        assert [r.qname for r in got] == ["r2", "r4", "r8"]  # sorted
        assert all(r.cigar == make_record().cigar for r in got)
