"""Per-experiment analyses (reference ``nanopore/analyses/``).

Registry mirrors the reference's enabled set (pipeline.py:81) plus the
default-disabled extras.
"""

from nanopore_tpu.analyses.base import Analysis
from nanopore_tpu.analyses.substitutions import Substitutions
from nanopore_tpu.analyses.coverage import LocalCoverage, GlobalCoverage
from nanopore_tpu.analyses.indels import Indels
from nanopore_tpu.analyses.kmer import KmerAnalysis, IndelKmerAnalysis
from nanopore_tpu.analyses.channel import ChannelMappability
from nanopore_tpu.analyses.alignment_uncertainty import AlignmentUncertainty
from nanopore_tpu.analyses.hmm_analysis import Hmm
from nanopore_tpu.analyses.snp_caller import MarginAlignSnpCaller
from nanopore_tpu.analyses.consensus import Consensus
from nanopore_tpu.analyses.qc import FastQC, QualiMap

# default-enabled analyses (reference pipeline.py:81)
DEFAULT_ANALYSES = [
    Hmm,
    GlobalCoverage,
    LocalCoverage,
    Substitutions,
    Indels,
    AlignmentUncertainty,
    ChannelMappability,
    KmerAnalysis,
    IndelKmerAnalysis,
]

ALL_ANALYSES = {
    cls.__name__: cls
    for cls in [
        Hmm,
        GlobalCoverage,
        LocalCoverage,
        Substitutions,
        Indels,
        AlignmentUncertainty,
        ChannelMappability,
        KmerAnalysis,
        IndelKmerAnalysis,
        MarginAlignSnpCaller,
        Consensus,
        FastQC,
        QualiMap,
    ]
}
