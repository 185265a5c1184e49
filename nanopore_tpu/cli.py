"""Command-line interface.

``python -m nanopore_tpu.cli run <workingDir>`` is the equivalent of the
reference's ``make run`` / ``pipeline.sh <workingDir> ...``
(/root/reference/Makefile:8-12, nanopore/pipeline.sh:9), with the
code-as-config mapper/analysis lists (reference pipeline.py:45-95)
surfaced as flags.  Additional subcommands expose the building blocks
(map / chain / realign / em) directly.
"""

from __future__ import annotations

import argparse
import logging
import sys


def _setup_logging(level: str) -> None:
    logging.basicConfig(
        level=getattr(logging, level.upper()),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )


def _setup_compilation_cache() -> None:
    """Persist XLA compilations — the remote TPU backend takes minutes
    per banded-scan graph, once per shape.

    TPU-class backends only: CPU compiles of these graphs take seconds,
    and persisting them mixes host-specific CPU executables into the
    committed TPU compile cache — a stale or truncated CPU entry
    segfaults ``backend.deserialize_executable`` on a later read (seen
    in CI: the CLI tests enabled the cache in-process and a later
    kernel test crashed reading a CPU entry)."""
    import os

    import jax

    try:
        if jax.default_backend() == "cpu":
            return
    except Exception:
        return

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def cmd_run(args) -> int:
    from nanopore_tpu.pipeline import run_pipeline, PipelineConfig
    from nanopore_tpu.align.em import EmOptions

    config = PipelineConfig()
    if args.mappers:
        config.mappers = args.mappers.split(",")
    if args.analyses:
        config.analyses = args.analyses.split(",")
    if args.meta_analyses is not None:
        config.meta_analyses = (
            args.meta_analyses.split(",") if args.meta_analyses else []
        )
    config.max_workers = args.max_threads
    config.em_options = EmOptions(
        trials=args.em_trials, iterations=args.em_iterations
    )
    config.mutate_references = args.mutate_references
    config.sample_reads = args.sample_reads
    out = run_pipeline(args.working_dir, config)
    print("pipeline complete: %s" % out)
    return 0


def cmd_map(args) -> int:
    from nanopore_tpu.mapping.runner import run_mapper

    run_mapper(
        args.mapper, args.reads, "reads", args.reference, args.output,
        args.hmm_out,
    )
    print("wrote %s" % args.output)
    return 0


def cmd_chain(args) -> int:
    from nanopore_tpu.align.chain_sam import chain_sam_file

    chain_sam_file(args.input, args.output, args.reads, args.reference)
    print("wrote %s" % args.output)
    return 0


def cmd_realign(args) -> int:
    from nanopore_tpu.align.realign import realign_sam_file
    from nanopore_tpu.align.model import PairHmmModel

    model = PairHmmModel.load(args.hmm) if args.hmm else None
    realign_sam_file(
        args.input, args.output, args.reads, args.reference,
        gap_gamma=args.gap_gamma, match_gamma=args.match_gamma,
        hmm_model=model, band_width=args.band_width,
    )
    print("wrote %s" % args.output)
    return 0


def cmd_em(args) -> int:
    from nanopore_tpu.align.em import learn_model_from_sam_file, EmOptions

    learn_model_from_sam_file(
        args.input, args.reference, args.output,
        EmOptions(trials=args.trials, iterations=args.iterations),
    )
    print("wrote %s (+ _unnormalised, .xml)" % args.output)
    return 0


def cmd_modify_hmm(args) -> int:
    """scripts/modifyHmm.py equivalent (reference scripts/modifyHmm.py)."""
    from nanopore_tpu.align.model import PairHmmModel

    model = PairHmmModel.load(args.input)
    if args.flatten_indels:
        model.set_indel_emissions_flat()
    model.normalise_by_reference_gc_content(args.gc_content)
    if args.substitution_rate > 0:
        model.modify_emissions_by_expected_variation_rate(
            args.substitution_rate
        )
    model.write(args.output)
    print("wrote %s" % args.output)
    return 0


def cmd_sam2bam(args) -> int:
    """samtools view -b | sort | index equivalent (utils.py:222-230)."""
    from nanopore_tpu.io.bam import sam_to_sorted_bam

    out = args.output or (args.input.rsplit(".", 1)[0] + ".bam")
    sam_to_sorted_bam(args.input, out, out + ".bai")
    print("wrote %s (+ .bai)" % out)
    return 0


def cmd_bam2sam(args) -> int:
    """samtools view equivalent: BAM back to SAM text."""
    from nanopore_tpu.io.bam import BamReader
    from nanopore_tpu.io.sam import SamWriter

    out = args.output or (args.input.rsplit(".", 1)[0] + ".sam")
    with BamReader(args.input) as br:
        with SamWriter(out, br.reference_lengths) as w:
            for rec in br:
                w.write(rec)
    print("wrote %s" % out)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="nanopore_tpu",
        description="TPU-native nanopore mapping and analysis engine",
    )
    parser.add_argument("--log-level", default="INFO")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("run", help="run the full pipeline on a working dir")
    p.add_argument("working_dir")
    p.add_argument("--mappers", default="", help="comma-separated mapper names")
    p.add_argument("--analyses", default="", help="comma-separated analyses")
    p.add_argument("--meta-analyses", default=None)
    p.add_argument("--max-threads", type=int, default=4)
    p.add_argument("--em-trials", type=int, default=3)
    p.add_argument("--em-iterations", type=int, default=100)
    p.add_argument("--mutate-references", action="store_true")
    p.add_argument("--sample-reads", action="store_true")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("map", help="map a FASTQ against a reference")
    p.add_argument("reads")
    p.add_argument("reference")
    p.add_argument("output")
    p.add_argument("--mapper", default="LastParams")
    p.add_argument("--hmm-out", default=None)
    p.set_defaults(fn=cmd_map)

    p = sub.add_parser("chain", help="chain a SAM into global alignments")
    p.add_argument("input")
    p.add_argument("reads")
    p.add_argument("reference")
    p.add_argument("output")
    p.set_defaults(fn=cmd_chain)

    p = sub.add_parser("realign", help="chain + MEA-realign a SAM")
    p.add_argument("input")
    p.add_argument("reads")
    p.add_argument("reference")
    p.add_argument("output")
    p.add_argument("--hmm", default=None)
    p.add_argument("--gap-gamma", type=float, default=0.5)
    p.add_argument("--match-gamma", type=float, default=0.0)
    # the realign-parity band: the reference's production band is 21
    # cells (--diagonalExpansion=10); 32 covers it at half the cells
    # of 64 (MapperSpec.band_width default)
    p.add_argument("--band-width", type=int, default=32)
    p.set_defaults(fn=cmd_realign)

    p = sub.add_parser("em", help="Baum-Welch train an HMM on a chained SAM")
    p.add_argument("input")
    p.add_argument("reference")
    p.add_argument("output")
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--iterations", type=int, default=100)
    p.set_defaults(fn=cmd_em)

    p = sub.add_parser("sam2bam", help="SAM -> sorted BAM + .bai index")
    p.add_argument("input")
    p.add_argument("-o", "--output", default=None)
    p.set_defaults(fn=cmd_sam2bam)

    p = sub.add_parser("bam2sam", help="BAM -> SAM text")
    p.add_argument("input")
    p.add_argument("-o", "--output", default=None)
    p.set_defaults(fn=cmd_bam2sam)

    p = sub.add_parser(
        "modify-hmm", help="renormalise an HMM (scripts/modifyHmm.py)"
    )
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--gc-content", type=float, default=0.5)
    p.add_argument("--substitution-rate", type=float, default=0.0)
    p.add_argument("--flatten-indels", action="store_true")
    p.set_defaults(fn=cmd_modify_hmm)

    args = parser.parse_args(argv)
    _setup_logging(args.log_level)
    _setup_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
