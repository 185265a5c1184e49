"""End-to-end pipeline tests on a synthetic working directory."""

import json
import os

import numpy as np
import pytest

from nanopore_tpu.io.encoding import decode, reverse_complement
from nanopore_tpu.io.seqio import fasta_write, fastq_write
from nanopore_tpu.runtime.scheduler import Scheduler, SchedulerError


class TestScheduler:
    def test_ordering_and_stats(self, tmp_path):
        order = []
        s = Scheduler(max_workers=2)
        s.add_task("a", lambda: order.append("a"))
        s.add_task("b", lambda: order.append("b"), deps=["a"])
        s.add_task("c", lambda: order.append("c"), deps=["a"])
        s.add_task("d", lambda: order.append("d"), deps=["b", "c"])
        stats = str(tmp_path / "stats.json")
        results = s.run(stats_path=stats)
        assert order[0] == "a" and order[-1] == "d"
        assert all(r.status == "done" for r in results.values())
        data = json.load(open(stats))
        assert set(data) == {"a", "b", "c", "d"}

    def test_skip_if(self):
        ran = []
        s = Scheduler(max_workers=1)
        s.add_task("x", lambda: ran.append(1), skip_if=lambda: True)
        results = s.run()
        assert results["x"].status == "skipped"
        assert not ran

    def test_failure_propagates(self):
        ran = []

        def boom():
            raise RuntimeError("kaboom")

        s = Scheduler(max_workers=2)
        s.add_task("bad", boom, retries=2)
        s.add_task("child", lambda: ran.append(1), deps=["bad"])
        s.add_task("independent", lambda: ran.append(2))
        with pytest.raises(SchedulerError) as exc_info:
            s.run()
        names = {r.name for r in exc_info.value.failed}
        assert names == {"bad", "child"}
        assert 2 in ran and 1 not in ran

    def test_retries(self):
        attempts = []

        def flaky():
            attempts.append(1)
            if len(attempts) < 2:
                raise RuntimeError("transient")

        s = Scheduler(max_workers=1)
        s.add_task("f", flaky, retries=3)
        results = s.run()
        assert results["f"].status == "done"
        assert results["f"].attempts == 2


@pytest.fixture(scope="module")
def working_dir(tmp_path_factory):
    """Synthetic working dir in the reference's expected layout."""
    wd = tmp_path_factory.mktemp("wd")
    rng = np.random.default_rng(21)
    ref = decode(rng.integers(0, 4, 1500).astype(np.int8))
    os.makedirs(wd / "referenceFastaFiles")
    fasta_write(str(wd / "referenceFastaFiles" / "ref.fa"), "REF blah", ref)

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

    os.makedirs(wd / "readFastqFiles" / "2d")
    with open(wd / "readFastqFiles" / "2d" / "reads.fq", "w") as fh:
        fastq_write(fh, "read_one", noisy(ref[100:800]), None)
        fastq_write(
            fh, "read_two", reverse_complement(noisy(ref[600:1400])), None
        )
    return str(wd)


class TestPipelineEndToEnd:
    def test_full_pipeline(self, working_dir):
        from nanopore_tpu.pipeline import run_pipeline, PipelineConfig
        from nanopore_tpu.align.em import EmOptions

        config = PipelineConfig(
            mappers=["LastParamsChain", "LastParamsRealignEm"],
            analyses=["GlobalCoverage", "Substitutions", "Indels", "Hmm"],
            meta_analyses=[
                "CoverageSummary",
                "UnmappedLengthDistributionAnalysis",
                "ComparePerReadMappabilityByMapper",
                "HmmMetaAnalysis",
            ],
            max_workers=2,
            em_options=EmOptions(trials=1, iterations=3, band_width=48),
        )
        out = run_pipeline(working_dir, config)
        base = os.path.join(out, "analysis_2d")
        exps = sorted(os.listdir(base))
        assert exps == [
            "experiment_reads.fq_ref.fa_LastParamsChain",
            "experiment_reads.fq_ref.fa_LastParamsRealignEm",
        ]
        for exp in exps:
            exp_dir = os.path.join(base, exp)
            assert os.path.exists(os.path.join(exp_dir, "mapping.sam"))
            for analysis in ("GlobalCoverage", "Substitutions", "Indels"):
                assert os.path.exists(
                    os.path.join(exp_dir, "analysis_" + analysis, "DONE")
                ), (exp, analysis)
        # the chained mapper produced global records
        from nanopore_tpu.io.sam import SamReader, CIG
        from nanopore_tpu.io.seqio import read_fasta_dict

        chained_sam = os.path.join(base, exps[0], "mapping.sam")
        refs = read_fasta_dict(
            os.path.join(out, "processedReferenceFastaFiles", "ref.fa")
        )
        for rec in SamReader(chained_sam).mapped():
            assert rec.pos == 0
            ref_len = sum(
                l for op, l in rec.cigar if op in (CIG.M, CIG.D)
            )
            assert ref_len == len(refs["REF"])
        # EM wrote the hmm files
        em_dir = os.path.join(base, exps[1])
        assert os.path.exists(os.path.join(em_dir, "hmm.txt"))
        assert os.path.exists(os.path.join(em_dir, "hmm.txt.xml"))
        # meta-analyses produced their outputs
        assert os.path.exists(
            os.path.join(out, "metaAnalysis_CoverageSummary")
        )
        venn_dir = os.path.join(
            out, "metaAnalysis_ComparePerReadMappabilityByMapper"
        )
        assert os.path.exists(
            os.path.join(venn_dir, "2d_perReadMappability.tsv")
        )
        stats = json.load(
            open(os.path.join(out, "pipeline_stats.json"))
        )
        assert all(v["status"] in ("done", "skipped") for v in stats.values())

    def test_resume_skips_completed(self, working_dir):
        """Second run: mapping.sam exists + DONE markers -> all skipped."""
        from nanopore_tpu.pipeline import run_pipeline, PipelineConfig
        from nanopore_tpu.align.em import EmOptions

        config = PipelineConfig(
            mappers=["LastParamsChain"],
            analyses=["Substitutions"],
            meta_analyses=[],
            max_workers=1,
            em_options=EmOptions(trials=1, iterations=2),
        )
        out = run_pipeline(working_dir, config)
        stats = json.load(open(os.path.join(out, "pipeline_stats.json")))
        for name, entry in stats.items():
            assert entry["status"] == "skipped", (name, entry)


class TestTwoBit:
    def test_roundtrip(self, tmp_path):
        from nanopore_tpu.io.twobit import write_2bit, read_2bit_names

        p = str(tmp_path / "x.2bit")
        seqs = {"c1": "ACGTNNNACGT", "c2": "GGGG"}
        write_2bit(seqs, p)
        assert read_2bit_names(p) == {"c1": 11, "c2": 4}
