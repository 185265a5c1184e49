"""Pipeline driver: experiment cross-product over a working directory.

Reproduces the reference driver (/root/reference/nanopore/pipeline.py):
discover ``readFastqFiles/<readType>/*.fq`` and
``referenceFastaFiles/*.fa``, uniquify sequence names into
``output/processed*Files``, then for every (readType, fastq, reference,
mapper) run map -> analyses, and after ALL experiments the
meta-analyses — with the same directory naming and resume semantics
(mapping.sam existence, per-analysis DONE markers; pipeline.py:98-149,
173-191).  jobTree is replaced by the host DAG scheduler
(nanopore_tpu.runtime.scheduler).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field

from nanopore_tpu.align.em import EmOptions
from nanopore_tpu.analyses import ALL_ANALYSES, DEFAULT_ANALYSES, Analysis
from nanopore_tpu.io.seqio import (
    make_fasta_names_unique,
    make_fastq_names_unique,
)
from nanopore_tpu.mapping.presets import DEFAULT_MAPPERS, MAPPER_REGISTRY
from nanopore_tpu.mapping.runner import run_mapper
from nanopore_tpu.runtime.scheduler import Scheduler

logger = logging.getLogger("nanopore_tpu")

DEFAULT_META_ANALYSES = [
    "UnmappedKmerAnalysis",
    "CoverageSummary",
    "UnmappedLengthDistributionAnalysis",
    "ComparePerReadMappabilityByMapper",
    "HmmMetaAnalysis",
]


@dataclass
class Experiment:
    read_fastq_file: str
    read_type: str
    reference_fasta_file: str
    mapper_name: str
    experiment_dir: str

    @property
    def sam_file(self) -> str:
        return os.path.join(self.experiment_dir, "mapping.sam")

    @property
    def hmm_file(self) -> str:
        return os.path.join(self.experiment_dir, "hmm.txt")


@dataclass
class PipelineConfig:
    mappers: list[str] = field(default_factory=lambda: list(DEFAULT_MAPPERS))
    analyses: list[str] = field(
        default_factory=lambda: [cls.__name__ for cls in DEFAULT_ANALYSES]
    )
    meta_analyses: list[str] = field(
        default_factory=lambda: list(DEFAULT_META_ANALYSES)
    )
    max_workers: int = 4
    em_options: EmOptions = field(default_factory=EmOptions)
    mutate_references: bool = False  # pipeline.py:193-194 (disabled)
    sample_reads: bool = False  # pipeline.py:162-163 (disabled)


def discover_inputs(
    working_dir: str, output_dir: str
) -> tuple[list[tuple[str, list[str]]], list[str]]:
    """Uniquify names into output/processed*Files (pipeline.py:173-191)."""
    processed_fastq = os.path.join(output_dir, "processedReadFastqFiles")
    os.makedirs(processed_fastq, exist_ok=True)
    fastq_parent = os.path.join(working_dir, "readFastqFiles")
    read_fastq_files: list[tuple[str, list[str]]] = []
    for entry in sorted(os.listdir(fastq_parent)):
        sub = os.path.join(fastq_parent, entry)
        if not os.path.isdir(sub):
            continue
        read_type = entry
        out_sub = os.path.join(processed_fastq, read_type)
        os.makedirs(out_sub, exist_ok=True)
        files = []
        for fname in sorted(os.listdir(sub)):
            if fname.endswith(".fq") or fname.endswith(".fastq"):
                out_path = os.path.join(out_sub, fname)
                if not os.path.exists(out_path):
                    make_fastq_names_unique(
                        os.path.join(sub, fname), out_path
                    )
                files.append(out_path)
        read_fastq_files.append((read_type, files))

    processed_fasta = os.path.join(output_dir, "processedReferenceFastaFiles")
    os.makedirs(processed_fasta, exist_ok=True)
    fasta_parent = os.path.join(working_dir, "referenceFastaFiles")
    reference_fasta_files = []
    for fname in sorted(os.listdir(fasta_parent)):
        if fname.endswith(".fa") or fname.endswith(".fasta"):
            out_path = os.path.join(processed_fasta, fname)
            if not os.path.exists(out_path):
                make_fasta_names_unique(
                    os.path.join(fasta_parent, fname), out_path
                )
            reference_fasta_files.append(out_path)
    return read_fastq_files, reference_fasta_files


def build_experiments(
    output_dir: str,
    read_fastq_files: list[tuple[str, list[str]]],
    reference_fasta_files: list[str],
    mappers: list[str],
) -> list[Experiment]:
    experiments = []
    for read_type, fastq_files in read_fastq_files:
        base = os.path.join(output_dir, "analysis_" + read_type)
        os.makedirs(base, exist_ok=True)
        for fastq in fastq_files:
            for ref in reference_fasta_files:
                for mapper in mappers:
                    exp_dir = os.path.join(
                        base,
                        "experiment_%s_%s_%s"
                        % (
                            os.path.basename(fastq),
                            os.path.basename(ref),
                            mapper,
                        ),
                    )
                    experiments.append(
                        Experiment(fastq, read_type, ref, mapper, exp_dir)
                    )
    return experiments


def run_pipeline(
    working_dir: str, config: PipelineConfig | None = None
) -> str:
    """Run the full pipeline; returns the output directory.

    Tracing: set ``NANOPORE_TPU_PROFILE=<dir>`` to capture a JAX
    profiler trace (host + device timelines, viewable in TensorBoard /
    Perfetto) of the whole run — the analogue of the reference's
    always-on jobTree ``--stats`` (reference nanopore/pipeline.sh:9);
    per-task wall/CPU stats land in output/pipeline_stats.json either
    way (runtime/scheduler.py).
    """
    profile_dir = os.environ.get("NANOPORE_TPU_PROFILE")
    if profile_dir:
        import jax

        with jax.profiler.trace(profile_dir):
            return _run_pipeline_impl(working_dir, config)
    return _run_pipeline_impl(working_dir, config)


def _run_pipeline_impl(
    working_dir: str, config: PipelineConfig | None = None
) -> str:
    config = config or PipelineConfig()
    for mapper in config.mappers:
        assert mapper in MAPPER_REGISTRY, "unknown mapper %s" % mapper
    for name in config.analyses:
        assert name in ALL_ANALYSES, "unknown analysis %s" % name

    output_dir = os.path.join(working_dir, "output")
    os.makedirs(output_dir, exist_ok=True)

    from nanopore_tpu.parallel import distributed as dist

    _pi, pc = dist.initialize_distributed()
    if pc > 1:
        return _run_pipeline_distributed(working_dir, config, output_dir)

    if config.sample_reads:
        from nanopore_tpu.analyses.read_sampler import sample_reads

        sample_reads(working_dir)

    read_fastq_files, reference_fasta_files = discover_inputs(
        working_dir, output_dir
    )
    if config.mutate_references:
        from nanopore_tpu.analyses.mutate_reference import (
            mutate_reference_sequences,
        )

        reference_fasta_files = mutate_reference_sequences(
            reference_fasta_files
        )

    experiments = build_experiments(
        output_dir, read_fastq_files, reference_fasta_files, config.mappers
    )
    logger.info(
        "pipeline: %d experiments (%d mappers x inputs)",
        len(experiments),
        len(config.mappers),
    )

    sched = Scheduler(max_workers=config.max_workers)
    analysis_task_names = []
    for exp in experiments:
        os.makedirs(exp.experiment_dir, exist_ok=True)
        map_task = "map:%s" % exp.experiment_dir

        def map_fn(exp=exp):
            run_mapper(
                exp.mapper_name,
                exp.read_fastq_file,
                exp.read_type,
                exp.reference_fasta_file,
                exp.sam_file,
                exp.hmm_file,
                config.em_options,
            )

        sched.add_task(
            map_task,
            map_fn,
            skip_if=lambda exp=exp: os.path.exists(exp.sam_file),
        )
        for analysis_name in config.analyses:
            cls = ALL_ANALYSES[analysis_name]
            analysis_dir = os.path.join(
                exp.experiment_dir, "analysis_" + analysis_name
            )
            os.makedirs(analysis_dir, exist_ok=True)
            task_name = "analysis:%s:%s" % (analysis_name, exp.experiment_dir)

            def analysis_fn(exp=exp, cls=cls, analysis_dir=analysis_dir):
                Analysis.reset(analysis_dir)
                cls(
                    exp.read_fastq_file,
                    exp.read_type,
                    exp.reference_fasta_file,
                    exp.sam_file,
                    analysis_dir,
                ).execute()

            sched.add_task(
                task_name,
                analysis_fn,
                deps=[map_task],
                skip_if=lambda d=analysis_dir: Analysis.is_finished(d),
            )
            analysis_task_names.append(task_name)

    # meta-analyses run after every experiment (pipeline.py:112,144-149)
    from nanopore_tpu.meta import ALL_META_ANALYSES

    for meta_name in config.meta_analyses:
        meta_cls = ALL_META_ANALYSES[meta_name]
        meta_dir = os.path.join(output_dir, "metaAnalysis_" + meta_name)
        os.makedirs(meta_dir, exist_ok=True)

        def meta_fn(meta_cls=meta_cls, meta_dir=meta_dir):
            meta_cls(meta_dir, experiments, config.analyses).run()

        sched.add_task(
            "meta:%s" % meta_name, meta_fn, deps=list(analysis_task_names)
        )

    sched.run(stats_path=os.path.join(output_dir, "pipeline_stats.json"))
    return output_dir


def _run_pipeline_distributed(
    working_dir: str, config: PipelineConfig, output_dir: str
) -> str:
    """Multi-host pipeline: the jax.distributed product path.

    The reference places jobTree targets on cluster nodes over a shared
    filesystem (Makefile:2, pipeline.sh:9); here every host runs this
    function cooperatively: mapping/realign/EM work within each
    experiment is read-sharded across hosts (mapping/runner
    _run_mapper_distributed; EM psums over the global mesh), analysis
    tasks are strided-sharded whole across hosts, meta-analyses run on
    host 0 after a global barrier.  All cross-host sync happens on this
    (main) thread; local Scheduler threads never touch collectives.
    """
    from nanopore_tpu.parallel import distributed as dist

    pi, pc = dist.process_info()
    logger.info("distributed pipeline: host %d/%d", pi, pc)

    # --- input discovery: host 0 writes processed*Files, others read --- #
    if pi == 0:
        if config.sample_reads:
            from nanopore_tpu.analyses.read_sampler import sample_reads

            sample_reads(working_dir)
        read_fastq_files, reference_fasta_files = discover_inputs(
            working_dir, output_dir
        )
        if config.mutate_references:
            from nanopore_tpu.analyses.mutate_reference import (
                mutate_reference_sequences,
            )

            reference_fasta_files = mutate_reference_sequences(
                reference_fasta_files
            )
    dist.barrier("inputs")
    if pi != 0:
        read_fastq_files, reference_fasta_files = discover_inputs(
            working_dir, output_dir
        )
        if config.mutate_references:
            from nanopore_tpu.analyses.mutate_reference import (
                mutate_reference_sequences,
            )

            reference_fasta_files = mutate_reference_sequences(
                reference_fasta_files
            )

    experiments = build_experiments(
        output_dir, read_fastq_files, reference_fasta_files, config.mappers
    )

    # --- mapping: cooperative per experiment, deterministic order ------ #
    for exp in experiments:
        os.makedirs(exp.experiment_dir, exist_ok=True)
        # skip decided by host 0 so no host diverges on FS visibility
        skip = dist.coordinator_decision(os.path.exists(exp.sam_file))
        if skip:
            continue
        run_mapper(
            exp.mapper_name,
            exp.read_fastq_file,
            exp.read_type,
            exp.reference_fasta_file,
            exp.sam_file,
            exp.hmm_file,
            config.em_options,
            distributed=True,
        )
    dist.barrier("mapping")

    # --- analyses: whole tasks strided across hosts --------------------- #
    tasks = []
    for exp in experiments:
        for analysis_name in config.analyses:
            tasks.append((exp, analysis_name))
    sched = Scheduler(max_workers=config.max_workers)
    for exp, analysis_name in dist.host_shard(tasks):
        cls = ALL_ANALYSES[analysis_name]
        analysis_dir = os.path.join(
            exp.experiment_dir, "analysis_" + analysis_name
        )
        os.makedirs(analysis_dir, exist_ok=True)

        def analysis_fn(exp=exp, cls=cls, analysis_dir=analysis_dir):
            Analysis.reset(analysis_dir)
            cls(
                exp.read_fastq_file,
                exp.read_type,
                exp.reference_fasta_file,
                exp.sam_file,
                analysis_dir,
            ).execute()

        sched.add_task(
            "analysis:%s:%s" % (analysis_name, exp.experiment_dir),
            analysis_fn,
            skip_if=lambda d=analysis_dir: Analysis.is_finished(d),
        )
    stats_path = os.path.join(
        output_dir,
        "pipeline_stats.json" if pi == 0 else "pipeline_stats.host%d.json" % pi,
    )
    sched.run(stats_path=stats_path)
    dist.barrier("analyses")

    # --- meta-analyses: host 0, after every experiment ------------------ #
    if pi == 0:
        from nanopore_tpu.meta import ALL_META_ANALYSES

        for meta_name in config.meta_analyses:
            meta_cls = ALL_META_ANALYSES[meta_name]
            meta_dir = os.path.join(output_dir, "metaAnalysis_" + meta_name)
            os.makedirs(meta_dir, exist_ok=True)
            meta_cls(meta_dir, experiments, config.analyses).run()
    dist.barrier("meta")
    return output_dir
