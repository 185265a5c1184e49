"""Alignment-uncertainty analysis: posterior rescoring of each alignment.

Reproduces the reference AlignmentUncertainty
(/root/reference/nanopore/analyses/alignmentUncertainty.py): for every
record, rescore the ORIGINAL alignment by its average posterior match
probability under the trained blasr_hmm_0 model (the reference runs
``cactus_realign --rescoreByPosteriorProbIgnoringGaps
--rescoreOriginalAlignment --diagonalExpansion=10
--splitMatrixBiggerThanThis=100 --loadHmm=blasr_hmm_0.txt`` per read,
alignmentUncertainty.py:41-42); here records go through the posterior
band backend picked by ops.dispatch (the fused Pallas kernel streaming
gamma_match on TPU, the XLA forward_backward elsewhere) in full
kernel-tile batches, and the rescoring is an on-device band reduction
(ops.posteriors.rescore_cigars) — the bands never cross to the host.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

from nanopore_tpu.analyses.base import Analysis
from nanopore_tpu.analyses.common import ExperimentData
from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.io.encoding import encode
from nanopore_tpu.io.sam import CIG
from nanopore_tpu.io.xmlio import pretty_xml
from nanopore_tpu.ops.pairhmm import make_kernel_params
from nanopore_tpu.ops.dispatch import (
    PreparedPosteriors,
    preferred_realign_batch_size,
    prepared_from_pairs,
)
from nanopore_tpu.ops.posteriors import rescore_from_post

TRAINED_HMM_DIR = os.path.join(os.path.dirname(__file__), "..", "models")


def trained_hmm_path(name: str = "blasr_hmm_0.txt") -> str:
    """Shipped trained model files (mirrors nanopore/mappers/*.txt)."""
    return os.path.abspath(os.path.join(TRAINED_HMM_DIR, name))


def _next_pow2(x: int) -> int:
    return 1 << max(6, (x - 1).bit_length())


class AlignmentUncertainty(Analysis):
    band_width = 64
    batch_size = None  # ops.dispatch picks (full Pallas tiles on TPU)

    def run(self) -> None:
        data = ExperimentData(
            self.read_fastq_file, self.reference_fasta_file, self.sam_file
        )
        model_path = trained_hmm_path("blasr_hmm_0.txt")
        model = (
            PairHmmModel.load(model_path)
            if os.path.exists(model_path)
            else PairHmmModel.default()
        )
        params = make_kernel_params(model)

        avg_posteriors: list[float] = []
        aligned_pairs_counts: list[int] = []

        records = data.records
        buckets: dict[tuple[int, int], list[int]] = {}
        items = []
        for idx, rec in enumerate(records):
            # local coordinates: query vs ref[pos:aend], clip-free cigar
            x = data.ref_codes[rec.rname][rec.pos : rec.aend]
            y = encode(rec.query)
            guide = [
                (op, l) for op, l in rec.cigar if op in (CIG.M, CIG.I, CIG.D)
            ]
            items.append((x, y, guide))
            buckets.setdefault(
                (_next_pow2(len(x)), _next_pow2(len(y))), []
            ).append(idx)

        results = [float("nan")] * len(records)
        batch_size = preferred_realign_batch_size(self.batch_size)

        def descriptors():
            for (n_pad, m_pad), idxs in buckets.items():
                for s in range(0, len(idxs), batch_size):
                    yield idxs[s : s + batch_size], n_pad + m_pad

        def build(desc):
            # fused direct pack + async kernel launch, on the
            # prefetched_map worker pool (overlaps earlier batches)
            sub, k_max = desc
            return sub, prepared_from_pairs(
                {},
                [items[i] for i in sub],
                params,
                band_width=self.band_width,
                k_max=k_max,
                prepared_cls=PreparedPosteriors,
            ).launch()

        from nanopore_tpu.runtime.prefetch import prefetched_map

        for sub, prep in prefetched_map(build, descriptors(), depth=2):
            out = prep.run()
            offs = np.asarray(prep.batch.offsets)
            scores = rescore_from_post(
                out, offs, [items[i][2] for i in sub], self.band_width
            )
            for b, i in enumerate(sub):
                results[i] = scores[b]

        for idx, rec in enumerate(records):
            avg_posteriors.append(results[idx])
            aligned_pairs_counts.append(
                sum(l for op, l in rec.cigar if op == CIG.M)
            )

        weighted = sum(
            p * a for p, a in zip(avg_posteriors, aligned_pairs_counts)
        )
        node = ET.Element(
            "alignmentUncertainty",
            {
                "averagePosteriorMatchProbabilityPerRead": str(
                    self.format_ratio(sum(avg_posteriors), len(avg_posteriors))
                ),
                "averagePosteriorMatchProbability": str(
                    self.format_ratio(weighted, sum(aligned_pairs_counts))
                ),
                "averagePosteriorMatchProbabilitesPerRead": ",".join(
                    str(v) for v in avg_posteriors
                ),
                "alignedPairsInCigar": ",".join(
                    str(v) for v in aligned_pairs_counts
                ),
            },
        )
        with open(self.out("alignmentUncertainty.xml"), "w") as fh:
            fh.write(pretty_xml(node))
        if avg_posteriors:
            from nanopore_tpu.analyses import plots

            plots.histogram_plot(
                avg_posteriors,
                self.out("posterior_prob_hist.pdf"),
                "avg posterior match probability",
            )
