"""K-mer composition analyses (plain + indel-boundary variants).

Reproduces the reference KmerAnalysis
(/root/reference/nanopore/analyses/kmerAnalysis.py) and
IndelKmerAnalysis (indelKmerAnalysis.py): 5-mer spectra of reference vs
reads (both strands), per-kmer fractions and -log fold change, plus the
significance table / volcano (kmer_analysis.R reimplemented in
analyses.plots).  Plain counting runs as a device bincount.

Reference quirks preserved for table parity:
- window enumeration skips the final k-mer of each sequence
  (kmerAnalysis.py:16, ``xrange(kmerSize, len(seq))``),
- output rows iterate itertools.product("ATGC") — ATGC order, not ACGT
  (kmerAnalysis.py:37).
"""

from __future__ import annotations

import itertools
import os

import numpy as np

from nanopore_tpu.analyses.base import Analysis
from nanopore_tpu.analyses.common import ExperimentData
from nanopore_tpu.io.encoding import encode
from nanopore_tpu.io.seqio import fasta_read, fastq_read
from nanopore_tpu.ops.reductions import kmer_count_vector, revcomp_kmer_counts

_CODE = {"A": 0, "C": 1, "G": 2, "T": 3}


def _kmer_to_index(kmer: str) -> int:
    idx = 0
    for ch in kmer:
        idx = idx * 4 + _CODE[ch]
    return idx


def count_kmers_both_strands(seqs, k: int) -> np.ndarray:
    """(4^k,) counts including reverse complements (kmerAnalysis.py:15-28)."""
    total = np.zeros(4**k, np.int64)
    for seq in seqs:
        counts = np.asarray(kmer_count_vector(encode(seq), k), np.int64)
        total += counts
        total += revcomp_kmer_counts(counts, k)
    return total


def write_kmer_table(
    path: str, ref_counts: np.ndarray, read_counts: np.ndarray, k: int
) -> None:
    """kmer_counts.txt schema (kmerAnalysis.py:32-47)."""
    ref_size = int(ref_counts.sum())
    read_size = int(read_counts.sum())
    with open(path, "w") as fh:
        fh.write(
            "kmer\trefCount\trefFraction\treadCount\treadFraction\t"
            "logFoldChange\n"
        )
        for kmer_tuple in itertools.product("ATGC", repeat=k):
            kmer = "".join(kmer_tuple)
            idx = _kmer_to_index(kmer)
            rc = int(ref_counts[idx])
            qc = int(read_counts[idx])
            rf = rc / ref_size if ref_size else 0.0
            qf = qc / read_size if read_size else 0.0
            if rf == 0:
                fold = "-Inf"
            elif qf == 0:
                fold = "Inf"
            else:
                fold = str(-np.log(qf / rf))
            fh.write(
                "\t".join(map(str, [kmer, rc, rf, qc, qf, fold])) + "\n"
            )


class KmerAnalysis(Analysis):
    kmer_size = 5

    def run(self) -> None:
        k = self.kmer_size
        ref_counts = count_kmers_both_strands(
            (seq for _, seq in fasta_read(self.reference_fasta_file)), k
        )
        read_counts = count_kmers_both_strands(
            (seq for _, seq, _ in fastq_read(self.read_fastq_file)), k
        )
        if ref_counts.sum() == 0 or read_counts.sum() == 0:
            return
        name = "all_bases_"
        table = self.out(name + "kmer_counts.txt")
        write_kmer_table(table, ref_counts, read_counts, k)
        from nanopore_tpu.analyses import plots

        plots.kmer_significance(
            table,
            self.out(name + "pval_kmer_counts.txt"),
            self.out(name + "top_bot_sigkmer_counts.txt"),
            self.out(name + "volcano_plot.pdf"),
            "Kmer",
        )


class IndelKmerAnalysis(Analysis):
    """K-mers spanning indel boundaries (indelKmerAnalysis.py).

    The reference slides an ordered-unique window (UniqueList) of k+1
    entries over each alignment column list, yielding (start, end) spans
    whose interior contains a gap; the spanned read (resp. ref) substring
    is counted, plus its reversal.  We reproduce the algorithm directly —
    it is O(#columns) — over our aligned-pair columns.
    """

    kmer_size = 5

    @staticmethod
    def _indel_kmer_spans(aligned: list, k: int):
        """Port of indelKmerFinder semantics (indelKmerAnalysis.py:11-19)."""
        window: list = []  # ordered unique values
        s = k + 1
        for value in aligned:
            if value not in window:
                window.append(value)
            if (
                window[0] is None
                or (len(window) == s and window[k] is None)
                or (None not in window and len(window) == s)
            ):
                window.pop(0)
            elif None in window and len(window) == s:
                yield (window[0], window[k])
                window.pop(0)

    def run(self) -> None:
        k = self.kmer_size
        data = ExperimentData(
            self.read_fastq_file, self.reference_fasta_file, self.sam_file
        )
        ref_counts: dict[tuple, int] = {}
        read_counts: dict[tuple, int] = {}

        def bump(d, key):
            d[key] = d.get(key, 0) + 1

        for rec in data.records:
            ref_seq = data.ref_seqs[rec.rname]
            read_seq = rec.query
            pairs = rec.aligned_pairs
            read_aligned = [q for q, _ in pairs]
            ref_aligned = [r for _, r in pairs]
            for start, end in self._indel_kmer_spans(read_aligned, k):
                s = tuple(read_seq[start : end + 1])
                bump(read_counts, s)
                bump(ref_counts, s[::-1])
            for start, end in self._indel_kmer_spans(ref_aligned, k):
                s = tuple(ref_seq[start : end + 1])
                bump(ref_counts, s)
                bump(ref_counts, s[::-1])

        if not ref_counts or not read_counts:
            return
        ref_size = sum(ref_counts.values())
        read_size = sum(read_counts.values())
        name = "indel_bases_"
        table = self.out(name + "kmer_counts.txt")
        with open(table, "w") as fh:
            fh.write(
                "kmer\trefCount\trefFraction\treadCount\treadFraction\t"
                "logFoldChange\n"
            )
            for kmer_tuple in itertools.product("ATGC", repeat=k):
                rc = ref_counts.get(kmer_tuple, 0)
                qc = read_counts.get(kmer_tuple, 0)
                rf = rc / ref_size if ref_size else 0.0
                qf = qc / read_size if read_size else 0.0
                if rf == 0:
                    fold = "-Inf"
                elif qf == 0:
                    fold = "Inf"
                else:
                    fold = str(-np.log(qf / rf))
                fh.write(
                    "\t".join(
                        map(str, ["".join(kmer_tuple), rc, rf, qc, qf, fold])
                    )
                    + "\n"
                )
        from nanopore_tpu.analyses import plots

        plots.kmer_significance(
            table,
            self.out(name + "pval_kmer_counts.txt"),
            self.out(name + "top_bot_sigkmer_counts.txt"),
            self.out(name + "volcano_plot.pdf"),
            "Indel_Kmer",
        )
