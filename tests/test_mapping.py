"""Tests for the unified seed-chain-extend mapper and SAM chaining."""

import numpy as np
import pytest

from nanopore_tpu.io.encoding import encode, decode, reverse_complement
from nanopore_tpu.io.sam import SamRecord, CIG, parse_cigar
from nanopore_tpu.mapping.index import KmerIndex, kmer_codes
from nanopore_tpu.mapping.chain import merge_hits_to_anchors, chain_anchors, Anchor
from nanopore_tpu.mapping.engine import MappingEngine, MapperConfig
from nanopore_tpu.align.chain_sam import (
    chain_records,
    merge_chained,
    aligned_span,
    absolute_read_offset,
)


def make_ref(rng, n=2000):
    return decode(rng.integers(0, 4, n).astype(np.int8))


def noisy_copy(rng, seq, sub=0.05, ins=0.05, dele=0.05):
    out = []
    for ch in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append("ACGT"[rng.integers(0, 4)])
        out.append(ch if rng.random() > sub else "ACGT"[rng.integers(0, 4)])
    return "".join(out)


class TestKmerIndex:
    def test_kmer_codes(self):
        codes = encode("ACGTN")
        km, valid = kmer_codes(codes, 2)
        # AC=0*4+1=1, CG=1*4+2=6, GT=2*4+3=11, TN invalid
        assert km[:3].tolist() == [1, 6, 11]
        assert valid.tolist() == [True, True, True, False]

    def test_build_and_lookup(self):
        ref = {"c1": "ACGTACGTACGT", "c2": "TTTTGGGGCCCC"}
        idx = KmerIndex.build(ref, k=4, max_occ=16)
        # lookup an exact substring of c2
        rp, qp = idx.lookup(encode("TGGGG"))
        assert len(rp) >= 1
        cidx, local = idx.global_to_contig(rp)
        assert (np.array(idx.contig_names)[cidx] == "c2").all()
        # every hit is a true match
        for g, q in zip(rp, qp):
            got = decode(idx.ref_codes[g : g + 4])
            assert got == "TGGGG"[q : q + 4]

    def test_no_cross_contig_kmers(self):
        ref = {"a": "AAAA", "b": "CCCC"}
        idx = KmerIndex.build(ref, k=4)
        rp, _ = idx.lookup(encode("AACC"))
        assert len(rp) == 0

    def test_max_occ_masking(self):
        ref = {"r": "A" * 100}
        idx = KmerIndex.build(ref, k=5, max_occ=10)
        rp, _ = idx.lookup(encode("AAAAA"))
        assert len(rp) == 0  # poly-A seed masked as over-represented

    def test_contig_roundtrip(self):
        ref = {"c1": "ACGTACGT", "c2": "GGGGCCCCAAAA"}
        idx = KmerIndex.build(ref, k=4)
        assert idx.contig_length(0) == 8
        assert idx.contig_length(1) == 12
        assert decode(idx.contig_codes(1)) == "GGGGCCCCAAAA"


class TestAnchorsAndChains:
    def test_merge_hits(self):
        # two runs on diagonal 10 and one stray hit
        ref_pos = np.array([10, 11, 12, 30, 100], np.int32)
        read_pos = np.array([0, 1, 2, 20, 50], np.int32)
        anchors = merge_hits_to_anchors(ref_pos, read_pos, k=5)
        spans = {(a.q_start, a.r_start, a.length) for a in anchors}
        assert (0, 10, 7) in spans  # run of 3 hits, k=5 -> length 7
        assert (20, 30, 5) in spans
        assert (50, 100, 5) in spans

    def test_chain_scores_and_order(self):
        anchors = [
            Anchor(0, 0, 20),
            Anchor(30, 32, 20),
            Anchor(60, 63, 20),
            Anchor(0, 1000, 10),  # decoy far away
        ]
        chains = chain_anchors(anchors, min_chain_score=5)
        assert chains[0].anchors[0].q_start == 0
        assert len(chains[0].anchors) == 3
        assert chains[0].score > 40

    def test_empty(self):
        assert chain_anchors([]) == []
        assert merge_hits_to_anchors(np.empty(0, np.int32), np.empty(0, np.int32), 5) == []


class TestMappingEngine:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(42)
        ref = make_ref(rng, 3000)
        return rng, {"ref1": ref}

    def test_forward_mapping(self, setup):
        rng, ref_dict = setup
        engine = MappingEngine(ref_dict, MapperConfig(batch_size=2))
        true_start = 500
        read = noisy_copy(rng, ref_dict["ref1"][true_start : true_start + 800])
        recs = engine.map_read("r1", read)
        assert len(recs) >= 1
        primary = [r for r in recs if not r.is_secondary][0]
        assert primary.rname == "ref1"
        assert not primary.is_reverse
        assert abs(primary.pos - true_start) < 30
        # cigar consumes the whole read
        consumed = sum(
            l for op, l in primary.cigar if op in (CIG.M, CIG.I, CIG.S)
        )
        assert consumed == len(read)
        # alignment is accurate: most bases are matches
        n_match = sum(l for op, l in primary.cigar if op == CIG.M)
        assert n_match > 0.8 * len(read)

    def test_reverse_mapping(self, setup):
        rng, ref_dict = setup
        engine = MappingEngine(ref_dict, MapperConfig(batch_size=2))
        read = reverse_complement(
            noisy_copy(rng, ref_dict["ref1"][1000:1700])
        )
        recs = engine.map_read("r2", read)
        primary = [r for r in recs if not r.is_secondary][0]
        assert primary.is_reverse
        assert abs(primary.pos - 1000) < 30
        # SAM convention: stored seq is the revcomp of the original read
        assert primary.seq == reverse_complement(read)

    def test_unmappable_read(self, setup):
        rng, ref_dict = setup
        engine = MappingEngine(ref_dict, MapperConfig())
        junk = decode(rng.integers(0, 4, 300).astype(np.int8))
        recs = engine.map_read("junk", junk)
        # random 300-mer vs 3kb ref: no confident chain expected
        assert all(r.mapq == 0 or alignment_weak(r) for r in recs) or recs == []

    def test_map_fastq_writes_sam(self, setup, tmp_path):
        rng, ref_dict = setup
        from nanopore_tpu.io.seqio import fastq_write
        from nanopore_tpu.io.sam import SamReader

        fq = str(tmp_path / "reads.fq")
        read = noisy_copy(rng, ref_dict["ref1"][200:900])
        with open(fq, "w") as fh:
            fastq_write(fh, "read1", read, [30] * len(read))
        sam = str(tmp_path / "mapping.sam")
        engine = MappingEngine(ref_dict, MapperConfig())
        n = engine.map_fastq(fq, sam)
        assert n >= 1
        reader = SamReader(sam)
        assert reader.references == ["ref1"]
        recs = list(reader.mapped())
        assert recs[0].qname == "read1"
        assert len(recs[0].qual) == len(recs[0].seq)

    def test_k_bins_bucketing_maps_mixed_lengths(self, setup, tmp_path):
        """k_bins pins one compiled shape per bin: mixed-length reads
        must still map correctly and land in at most len(k_bins)
        distinct buckets (compile-shape bound for nanopore mixes)."""
        rng, ref_dict = setup
        cfg = MapperConfig(batch_size=2, k_bins=(1024, 2048, 8192))
        engine = MappingEngine(ref_dict, cfg)
        seen_keys = set()
        orig = engine._prepare_batch

        def spy(sub, key):
            seen_keys.add(key)
            return orig(sub, key)

        engine._prepare_batch = spy
        fq = tmp_path / "mixed.fq"
        with open(fq, "w") as fh:
            for i, ln in enumerate((150, 400, 900, 1400)):
                start = rng.integers(0, 3000 - ln)
                read = noisy_copy(
                    rng, ref_dict["ref1"][start : start + ln]
                )
                fh.write(
                    "@m%d\n%s\n+\n%s\n"
                    % (i, read, "I" * len(read))
                )
        n = engine.map_fastq(str(fq), str(tmp_path / "mixed.sam"))
        assert n >= 4
        assert all(k[0] == "k" for k in seen_keys)
        assert len(seen_keys) <= 3


def alignment_weak(r):
    n_match = sum(l for op, l in r.cigar if op == CIG.M)
    return n_match < 50



class TestChainSam:
    """Semantics of chainFn / mergeChainedAlignedReads (utils.py:295-426)."""

    def make_local(self, qname, pos, cigar_str, seq, reverse=False):
        return SamRecord(
            qname=qname,
            flag=0x10 if reverse else 0,
            rname="ref",
            pos=pos,
            cigar=parse_cigar(cigar_str),
            seq=seq,
        )

    def test_absolute_read_offset_forward(self):
        rec = self.make_local("r", 10, "2S5M3S", "AACGTACTTT")
        assert absolute_read_offset(rec, 10) == 2

    def test_absolute_read_offset_reverse(self):
        # reverse record: seq is revcomp of read; offset counts from read end
        rec = self.make_local("r", 10, "2S5M3S", "AACGTACTTT", reverse=True)
        # L=10, hard clip 0 -> offset = -(10-1-0) + 2 = -7
        assert absolute_read_offset(rec, 10) == -7

    def test_aligned_span(self):
        rec = self.make_local("r", 10, "2S3M1D2M3S", "AACGTACTTT")
        r0, q0, r1, q1 = aligned_span(rec, 10)
        assert (r0, q0) == (10, 2)
        assert (r1, q1) == (15, 6)

    def test_chain_two_locals(self):
        read = "ACGTACGTGGTTACCA"  # 16bp
        # two local alignments: read[0:6]@ref10, read[8:14]@ref30
        rec1 = self.make_local("r", 10, "6M10S", read)
        rec2 = self.make_local("r", 30, "8S6M2S", read)
        chain = chain_records([rec2, rec1], len(read))
        assert [r.pos for r in chain] == [10, 30]

    def test_chain_respects_max_gap(self):
        read = "A" * 20
        rec1 = self.make_local("r", 0, "5M15S", read)
        rec2 = self.make_local("r", 500, "15S5M", read)
        chain = chain_records([rec1, rec2], len(read), max_gap=100)
        assert len(chain) == 1  # gap 495+10 > 100: no link, best single

    def test_merge_global_invariants_forward(self):
        ref = "G" * 50
        read = "ACGTACGTGGTTACCA"
        rec1 = self.make_local("r", 10, "6M10S", read)
        rec2 = self.make_local("r", 30, "8S6M2S", read)
        merged = merge_chained([rec1, rec2], ref, read)
        assert merged.pos == 0
        ref_len = sum(l for op, l in merged.cigar if op in (CIG.M, CIG.D))
        read_len = sum(l for op, l in merged.cigar if op in (CIG.M, CIG.I))
        assert ref_len == len(ref)
        assert read_len == len(read)
        assert merged.seq == read

    def test_merge_global_invariants_reverse(self):
        ref = "G" * 40
        read = "ACGTACGTGGTTACCA"
        # a single reverse local alignment
        seq_rev = reverse_complement(read)
        rec = SamRecord(
            qname="r", flag=0x10, rname="ref", pos=5,
            cigar=parse_cigar("3S10M3S"), seq=seq_rev,
        )
        merged = merge_chained([rec], ref, read)
        assert merged.is_reverse
        ref_len = sum(l for op, l in merged.cigar if op in (CIG.M, CIG.D))
        read_len = sum(l for op, l in merged.cigar if op in (CIG.M, CIG.I))
        assert ref_len == len(ref)
        assert read_len == len(read)
        assert merged.seq == seq_rev

    def test_chain_sam_file_end_to_end(self, tmp_path):
        """Map a noisy read split into two artificial locals, chain, check."""
        from nanopore_tpu.align.chain_sam import chain_sam_file
        from nanopore_tpu.io.seqio import fastq_write, fasta_write
        from nanopore_tpu.io.sam import SamWriter, SamReader

        rng = np.random.default_rng(7)
        ref = make_ref(rng, 400)
        read = ref[50:150] + ref[200:300]  # read = two exact ref chunks
        fq = str(tmp_path / "r.fq")
        fa = str(tmp_path / "ref.fa")
        with open(fq, "w") as fh:
            fastq_write(fh, "r1", read, None)
        fasta_write(fa, "ref", ref)
        sam_in = str(tmp_path / "in.sam")
        with SamWriter(sam_in, {"ref": len(ref)}) as w:
            w.write(SamRecord(qname="r1", flag=0, rname="ref", pos=50,
                              cigar=parse_cigar("100M100S"), seq=read))
            w.write(SamRecord(qname="r1", flag=0, rname="ref", pos=200,
                              cigar=parse_cigar("100S100M"), seq=read))
        sam_out = str(tmp_path / "out.sam")
        chain_sam_file(sam_in, sam_out, fq, fa)
        [rec] = list(SamReader(sam_out).mapped())
        assert rec.pos == 0
        ref_len = sum(l for op, l in rec.cigar if op in (CIG.M, CIG.D))
        read_len = sum(l for op, l in rec.cigar if op in (CIG.M, CIG.I))
        assert ref_len == len(ref)
        assert read_len == len(read)
        # the 50bp leading ref gap must appear as a leading deletion
        assert rec.cigar[0] == (CIG.D, 50)


class TestRunnerEngineCache:
    def test_concurrent_presets_sharing_index(self, tmp_path):
        """Two presets sharing (k, max_occ) must not stomp each other's
        config when mapper tasks run on scheduler threads (round-1 race:
        a shared cached engine's .config was mutated per call)."""
        from concurrent.futures import ThreadPoolExecutor
        from nanopore_tpu.io.seqio import fastq_write, fasta_write
        from nanopore_tpu.mapping import runner
        from nanopore_tpu.mapping.presets import MAPPER_REGISTRY

        sp_a = MAPPER_REGISTRY["LastParams"]
        sp_b = MAPPER_REGISTRY["BlasrParams"]
        assert (sp_a.config.k, sp_a.config.max_occ) == (
            sp_b.config.k, sp_b.config.max_occ
        )
        assert sp_a.config != sp_b.config  # best_n / thresholds differ

        rng = np.random.default_rng(3)
        ref = make_ref(rng, 1200)
        fa = str(tmp_path / "ref.fa")
        fasta_write(fa, "ref", ref)
        fq = str(tmp_path / "r.fq")
        with open(fq, "w") as fh:
            for i in range(4):
                fastq_write(
                    fh, "read_%d" % i,
                    noisy_copy(rng, ref[i * 200 : i * 200 + 500]), None,
                )

        def run_one(spec, out):
            runner.run_mapper(spec, fq, "2d", fa, out)
            return open(out).read()

        # golden single-threaded outputs
        gold_a = run_one(sp_a, str(tmp_path / "gold_a.sam"))
        gold_b = run_one(sp_b, str(tmp_path / "gold_b.sam"))
        assert runner._INDEX_CACHE  # the shared index really is cached

        with ThreadPoolExecutor(max_workers=2) as pool:
            for trial in range(3):
                fut_a = pool.submit(
                    run_one, sp_a, str(tmp_path / ("a%d.sam" % trial))
                )
                fut_b = pool.submit(
                    run_one, sp_b, str(tmp_path / ("b%d.sam" % trial))
                )
                assert fut_a.result() == gold_a
                assert fut_b.result() == gold_b


class TestMapqCalibration:
    """MAPQ from chain-score gap + pair-HMM placement posterior
    (engine._assign_mapq)."""

    def test_unique_high_repeat_low(self):
        rng = np.random.default_rng(7)
        seg = decode(rng.integers(0, 4, 800).astype(np.int8))
        unique = decode(rng.integers(0, 4, 800).astype(np.int8))
        # reference with an exact tandem repeat of seg and a unique region
        ref_dict = {"ref1": seg + seg + unique}
        engine = MappingEngine(ref_dict, MapperConfig(batch_size=4))

        rep_read = noisy_copy(rng, seg[100:600])
        uni_read = noisy_copy(rng, unique[100:600])
        rep = [r for r in engine.map_read("rep", rep_read)
               if not r.is_secondary]
        uni = [r for r in engine.map_read("uni", uni_read)
               if not r.is_secondary]
        assert uni and rep
        assert uni[0].mapq >= 40, uni[0].mapq
        assert rep[0].mapq <= 10, rep[0].mapq
        # secondaries are mapq 0
        assert all(
            r.mapq == 0 for r in engine.map_read("rep2", rep_read)
            if r.is_secondary
        )


class TestPrefetch:
    def test_order_and_exception(self):
        from nanopore_tpu.runtime.prefetch import prefetched

        def gen():
            for i in range(10):
                yield i * i

        assert list(prefetched(gen(), depth=2)) == [i * i for i in range(10)]
        assert list(prefetched(iter([lambda: 7, lambda: 8]))) == [7, 8]

        def boom():
            yield 1
            raise ValueError("producer failed")

        import pytest

        out = []
        with pytest.raises(ValueError, match="producer failed"):
            for x in prefetched(boom()):
                out.append(x)
        assert out == [1]

    def test_prefetched_map_ordered_parallel(self):
        import threading
        import time

        from nanopore_tpu.runtime.prefetch import prefetched_map

        seen_threads = set()

        def slow_sq(i):
            seen_threads.add(threading.get_ident())
            time.sleep(0.02 * ((i * 7) % 3))  # jittered completion order
            return i * i

        got = list(prefetched_map(slow_sq, range(16), workers=4))
        assert got == [i * i for i in range(16)]
        assert len(seen_threads) > 1, "work must spread over the pool"

        # fn exception propagates at the consumption point
        def maybe_boom(i):
            if i == 3:
                raise ValueError("worker failed")
            return i

        import pytest

        with pytest.raises(ValueError, match="worker failed"):
            list(prefetched_map(maybe_boom, range(8), workers=2))

        # workers=1 degrades to the single-thread path
        assert list(prefetched_map(lambda i: i + 1, range(5), workers=1)) == [
            1, 2, 3, 4, 5,
        ]

        # abandoning the iterator must not hang
        it = prefetched_map(slow_sq, range(100), workers=2)
        assert next(it) == 0
        it.close()


class TestSeedStride:
    def test_native_matches_fallback(self):
        """Strided lookup must agree between the C path and the numpy
        fallback (forced by nulling the native binding — the env knob
        is only read before the .so loads)."""
        from unittest import mock

        from nanopore_tpu.runtime import native_index

        rng = np.random.default_rng(5)
        ref = make_ref(rng, 4000)
        read = noisy_copy(rng, ref[700:2200])
        from nanopore_tpu.io.encoding import encode
        from nanopore_tpu.mapping.index import KmerIndex

        idx = KmerIndex.build({"r": ref}, k=13, max_occ=64)
        codes = encode(read)
        for stride in (1, 2, 3, 5):
            want = idx.lookup(codes, stride=stride)
            assert len(want[0]) > 0
            with mock.patch.object(
                native_index, "lookup", lambda *a, **k: None
            ):
                got = idx.lookup(codes, stride=stride)
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])
            if stride > 1:
                assert (want[1] % stride == 0).all()
