"""Cross-experiment meta-analyses (reference ``nanopore/metaAnalyses/``)."""

from nanopore_tpu.meta.base import MetaAnalysis, UnmappedMetaAnalysis, Read
from nanopore_tpu.meta.coverage_summary import CoverageSummary
from nanopore_tpu.meta.unmapped import (
    UnmappedKmerAnalysis,
    UnmappedLengthDistributionAnalysis,
    ComparePerReadMappabilityByMapper,
)
from nanopore_tpu.meta.hmm_meta import HmmMetaAnalysis
from nanopore_tpu.meta.coverage_depth import CoverageDepth
from nanopore_tpu.meta.margin_align_meta import MarginAlignMetaAnalysis
from nanopore_tpu.meta.assembly_hub import CustomTrackAssemblyHub

ALL_META_ANALYSES = {
    cls.__name__: cls
    for cls in [
        CoverageSummary,
        UnmappedKmerAnalysis,
        UnmappedLengthDistributionAnalysis,
        ComparePerReadMappabilityByMapper,
        HmmMetaAnalysis,
        CoverageDepth,
        MarginAlignMetaAnalysis,
        CustomTrackAssemblyHub,
    ]
}
