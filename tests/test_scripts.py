"""Tests for the post-hoc scripts layer."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from nanopore_tpu.scripts import pull_averages, extract_coverage_xmls
from nanopore_tpu.scripts import variant_table
from nanopore_tpu.scripts.blast_unmapped import parse_blast


def write_coverage_xml(path, mapper_tag, avg=0.8):
    root = ET.Element(
        "coverage_bestPerRead",
        {
            "avgmismatchesPerReadBase": str(avg / 8),
            "avgidentity": str(avg),
            "avginsertionsPerReadBase": str(avg / 10),
            "avgdeletionsPerReadBase": str(avg / 12),
        },
    )
    for i in range(2):
        ET.SubElement(
            root,
            "readAlignmentCoverage",
            {
                "readLength": str(1000 + i),
                "identity": str(avg),
                "insertionsPerReadBase": "0.05",
                "deletionsPerReadBase": "0.04",
                "mismatchesPerReadBase": "0.1",
            },
        )
    ET.ElementTree(root).write(path)


class TestPullAverages:
    def test_averages(self, tmp_path):
        paths = []
        for rep in range(3):
            d = tmp_path / ("rep%d" % rep) / "x.fa_LastParamsChain"
            os.makedirs(d)
            p = str(d / "coverage_bestPerRead.xml")
            write_coverage_xml(p, "LastParamsChain", avg=0.7 + 0.1 * rep)
            paths.append(p)
        lst = str(tmp_path / "list.txt")
        open(lst, "w").write("\n".join(paths) + "\n")
        out = str(tmp_path / "out.tsv")
        pull_averages.main([lst, out])
        lines = open(out).read().strip().split("\n")
        assert lines[0].startswith("mapper\t")
        fields = lines[1].split("\t")
        assert fields[0] == "LastParamsChain"
        assert float(fields[2]) == pytest.approx(0.8)

    def test_skips_realign_without_em(self, tmp_path):
        d = tmp_path / "x.fa_LastParamsRealign"
        os.makedirs(d)
        p = str(d / "c.xml")
        write_coverage_xml(p, "LastParamsRealign")
        lst = str(tmp_path / "list.txt")
        open(lst, "w").write(p + "\n")
        out = str(tmp_path / "out.tsv")
        pull_averages.main([lst, out])
        assert len(open(out).read().strip().split("\n")) == 1  # header only


class TestExtractCoverage:
    def test_extract(self, tmp_path):
        paths = []
        for i in range(3):
            p = str(tmp_path / ("c%d.xml" % i))
            write_coverage_xml(p, "M")
            paths.append(p)
        out = str(tmp_path / "out.txt")
        extract_coverage_xmls.main(paths + [out])
        lines = open(out).read().strip().split("\n")
        assert lines[0].startswith("length ")
        assert len(lines[0].split()) == 1 + 6  # 3 files x 2 reads
        assert lines[1].startswith("identity ")


class TestParseBlast:
    def test_parse(self):
        text = (
            "# BLASTN 2.2\n# Query: read1\n# 2 hits found\n"
            "read1\tgi|1|\tEscherichia coli\tE. coli genome\n"
            "read1\tgi|2|\tE. fergusonii\tgenome\n"
            "# BLASTN 2.2\n# Query: read2\n# 0 hits found\n"
        )
        results = list(parse_blast(text.splitlines(True)))
        assert results[0][0] == "read1"
        assert results[0][1] == ["gi|1|", "Escherichia coli", "E. coli genome"]
        assert results[1] == ("read2", None)


class TestVariantTable:
    def test_emits_latex(self, tmp_path):
        squares = str(tmp_path / "squares.txt")
        cov = ["30", "60", "ALL"]
        header = ["readType", "mapper", "caller", "%heldOut"]
        for metric in ("recall", "precision", "fscore"):
            for c in cov:
                header += [
                    "min_%s_coverage_%s" % (metric, c),
                    "avg_%s_coverage_%s" % (metric, c),
                    "max_%s_coverage_%s" % (metric, c),
                ]
        row = ["2d", "LastParamsChain", "marginAlignMaxExpectedSnpCalls_cactus",
               "0.05"] + ["0.5"] * 27
        with open(squares, "w") as fh:
            fh.write("\t".join(header) + "\n")
            fh.write("\t".join(row) + "\n")
        out = str(tmp_path / "table.tex")
        variant_table.main([out, squares])
        text = open(out).read()
        assert "\\begin{document}" in text
        assert "sidewaystable" in text
        assert "50.00" in text  # 0.5 -> percent
        assert "\\end{document}" in text


class TestMappabilityPlots:
    def test_layout_is_a_permutation(self):
        from nanopore_tpu.scripts.mappability_plots import flowcell_layout

        lay = flowcell_layout()
        assert lay.shape == (32, 16)
        assert sorted(lay.flatten().tolist()) == list(range(1, 513))
        # spot-check entries of the R table (mappability_plots.R:5-36)
        assert lay[0, 0] == 125 and lay[0, 15] == 512
        assert lay[31, 0] == 1 and lay[31, 4] == 129

    def test_renders_pdf(self, tmp_path):
        from nanopore_tpu.scripts import mappability_plots as mp

        rng = np.random.default_rng(0)
        tsvs = []
        for i in range(2):
            p = tmp_path / ("chan%d.tsv" % i)
            with open(p, "w") as fh:
                fh.write("Channel\tReadCount\tMappableReadCount\n")
                for ch in range(1, 513):
                    t = int(rng.integers(0, 20))
                    fh.write("%d\t%d\t%d\n" % (ch, t, rng.integers(0, t + 1)))
            tsvs.append(("run%d" % i, str(p)))
        out = str(tmp_path / "mapp.pdf")
        assert mp.main([out] + ["%s=%s" % lp for lp in tsvs]) == 0
        assert os.path.getsize(out) > 1000


class TestScatterPlots:
    def test_summary_scatter(self, tmp_path):
        from nanopore_tpu.scripts import scatter_plots as sp

        p = tmp_path / "summary.tsv"
        with open(p, "w") as fh:
            fh.write("AvgInsert\tAvgDelete\tavgMismatch\n")
            for i in range(6):
                fh.write("exp%d\t%.3f\t%.3f\t%.3f\n"
                         % (i, 0.01 * i, 0.02 * i, 0.03 + 0.001 * i))
        out = str(tmp_path / "scatter.pdf")
        assert sp.main(["summary", str(p), out]) == 0
        assert os.path.getsize(out) > 500

    @pytest.mark.parametrize("trends", [True, False])
    def test_combined(self, tmp_path, trends):
        from nanopore_tpu.scripts import scatter_plots as sp

        rng = np.random.default_rng(1)
        n = 200
        length = rng.integers(500, 20000, n).astype(float)
        ident = np.clip(0.9 - length / 1e5 + rng.normal(0, 0.02, n), 0, 1)
        p = tmp_path / "dist.txt"
        with open(p, "w") as fh:
            for name, vals in [
                ("length", length),
                ("identity", ident),
                ("mismatches", rng.uniform(0, 0.1, n)),
                ("insertions", rng.uniform(0, 0.05, n)),
                ("deletions", rng.uniform(0, 0.08, n)),
            ]:
                fh.write(name + " " + " ".join("%.5f" % v for v in vals) + "\n")
        out = str(tmp_path / "combined.pdf")
        args = ["combined", str(p), out] + ([] if trends else ["--no-trends"])
        assert sp.main(args) == 0
        assert os.path.getsize(out) > 1000
