"""Mapper execution: run a MapperSpec end to end (map + post-process).

The equivalent of one concrete reference mapper class's ``run()``
(e.g. LastParamsRealignEm at mappers/last_params.py:20-23): map the
FASTQ, then optionally chain / realign / EM-train, writing
``mapping.sam`` (and ``hmm.txt`` when training).
"""

from __future__ import annotations

import logging
import os
import tempfile

from nanopore_tpu.align.chain_sam import chain_sam_file, combine_sam_files
from nanopore_tpu.align.em import EmOptions, learn_model_from_sam_file
from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.align.realign import realign_sam_file
from nanopore_tpu.io.seqio import read_fasta_dict
from nanopore_tpu.mapping.engine import MappingEngine
from nanopore_tpu.mapping.presets import (
    MapperSpec,
    MAPPER_REGISTRY,
    COMBINED_MEMBERS,
)

logger = logging.getLogger("nanopore_tpu")

# Cache only the expensive, truly shareable artifact (the k-mer index,
# keyed by what determines it); each call gets its OWN engine so two
# presets sharing (k, max_occ) but differing in chain-score/decode
# settings can run concurrently on scheduler threads without stomping
# each other's config (round-1 race: engines were cached and their
# .config mutated in place).
_INDEX_CACHE: dict[tuple, tuple[dict, object]] = {}
_INDEX_LOCK = __import__("threading").Lock()


def _engine_for(reference_fasta_file: str, spec: MapperSpec) -> MappingEngine:
    key = (
        os.path.abspath(reference_fasta_file),
        spec.config.k,
        spec.config.max_occ,
    )
    with _INDEX_LOCK:
        cached = _INDEX_CACHE.get(key)
        if cached is None:
            from nanopore_tpu.mapping.index import KmerIndex

            ref = read_fasta_dict(reference_fasta_file)
            index = KmerIndex.build(
                ref, k=spec.config.k, max_occ=spec.config.max_occ
            )
            cached = (ref, index)
            _INDEX_CACHE[key] = cached
    ref, index = cached
    return MappingEngine(ref, spec.config, index=index)


def trained_model_path(name: str) -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "models",
        name,
    )


def run_mapper(
    spec: MapperSpec | str,
    read_fastq_file: str,
    read_type: str,
    reference_fasta_file: str,
    output_sam_file: str,
    hmm_file_to_train: str | None = None,
    em_options: EmOptions | None = None,
    distributed: bool = False,
) -> None:
    if isinstance(spec, str):
        spec = MAPPER_REGISTRY[spec]
    if distributed:
        from nanopore_tpu.parallel import distributed as dist

        if dist.process_info()[1] > 1:
            _run_mapper_distributed(
                spec, read_fastq_file, read_type, reference_fasta_file,
                output_sam_file, hmm_file_to_train, em_options,
            )
            return

    # --- map ----------------------------------------------------------- #
    if spec.combined:
        # run all four tuned presets, concatenate (combinedMapper.py:12-23)
        with tempfile.TemporaryDirectory() as tmp:
            member_sams = []
            for member in COMBINED_MEMBERS:
                member_spec = MAPPER_REGISTRY[member]
                sam = os.path.join(tmp, "mapping_%s.sam" % member)
                engine = _engine_for(reference_fasta_file, member_spec)
                engine.map_fastq(read_fastq_file, sam)
                member_sams.append(sam)
            combine_sam_files(
                member_sams[0], member_sams[1:], output_sam_file
            )
    else:
        engine = _engine_for(reference_fasta_file, spec)
        n = engine.map_fastq(read_fastq_file, output_sam_file)
        logger.info("%s: %d alignments -> %s", spec.name, n, output_sam_file)

    # --- post-process --------------------------------------------------- #
    if spec.post == "chain":
        _inplace_chain(spec, read_fastq_file, reference_fasta_file,
                       output_sam_file)
    elif spec.post in ("realign", "realign_em", "realign_trained"):
        model = None
        if spec.post == "realign_trained":
            model = PairHmmModel.load(trained_model_path(spec.trained_model))
        elif spec.post == "realign_em":
            assert hmm_file_to_train, "realign_em needs an hmm output path"
            # chain first, then train on the chained alignments
            # (realignSamFileTargetFn, utils.py:540-555)
            with tempfile.TemporaryDirectory() as tmp:
                chained = os.path.join(tmp, "chained.sam")
                chain_sam_file(
                    output_sam_file, chained, read_fastq_file,
                    reference_fasta_file,
                )
                model = learn_model_from_sam_file(
                    chained, reference_fasta_file, hmm_file_to_train,
                    em_options,
                )
        _inplace_realign(
            spec, read_fastq_file, reference_fasta_file, output_sam_file,
            model,
        )


def _run_mapper_distributed(
    spec: MapperSpec,
    read_fastq_file: str,
    read_type: str,
    reference_fasta_file: str,
    output_sam_file: str,
    hmm_file_to_train: str | None,
    em_options: EmOptions | None,
) -> None:
    """Multi-host run_mapper: every host executes this cooperatively.

    The TPU-native replacement for the reference's batch-system target
    placement (jobTree over parasol/gridEngine, reference Makefile:2):
    FASTQ reads are strided-sharded across hosts for mapping, chained
    records are strided-sharded for realignment, EM expectations psum
    over the global (dp, trial) mesh, and host 0 merges SAM/HMM files on
    the shared filesystem.  All barriers run on the caller's (main)
    thread — see parallel.distributed.barrier.
    """
    import shutil
    from dataclasses import replace as dc_replace

    from nanopore_tpu.parallel import distributed as dist

    pi, pc = dist.process_info()

    # --- map: each host its read shard, host 0 merges ------------------- #
    if spec.combined:
        member_bases = []
        for mi, member in enumerate(COMBINED_MEMBERS):
            member_spec = MAPPER_REGISTRY[member]
            base = "%s.m%d" % (output_sam_file, mi)
            engine = _engine_for(reference_fasta_file, member_spec)
            engine.map_fastq(
                read_fastq_file, "%s.shard%d" % (base, pi), shard=(pi, pc)
            )
            member_bases.append(base)
        dist.barrier("map:" + output_sam_file)
        if pi == 0:
            for base in member_bases:
                dist.merge_sam_shards(dist.shard_paths(base, pc), base)
            combine_sam_files(
                member_bases[0], member_bases[1:], output_sam_file
            )
            for base in member_bases:
                os.remove(base)
    else:
        engine = _engine_for(reference_fasta_file, spec)
        n = engine.map_fastq(
            read_fastq_file,
            "%s.shard%d" % (output_sam_file, pi),
            shard=(pi, pc),
        )
        logger.info(
            "%s[host %d/%d]: %d alignments", spec.name, pi, pc, n
        )
        dist.barrier("map:" + output_sam_file)
        if pi == 0:
            dist.merge_sam_shards(
                dist.shard_paths(output_sam_file, pc), output_sam_file
            )
    dist.barrier("mapmerge:" + output_sam_file)

    # --- post-process ---------------------------------------------------- #
    if spec.post == "chain":
        if pi == 0:
            _inplace_chain(
                spec, read_fastq_file, reference_fasta_file, output_sam_file
            )
        dist.barrier("chain:" + output_sam_file)
    elif spec.post in ("realign", "realign_em", "realign_trained"):
        model = None
        if spec.post == "realign_trained":
            model = PairHmmModel.load(trained_model_path(spec.trained_model))
        elif spec.post == "realign_em":
            assert hmm_file_to_train, "realign_em needs an hmm output path"
            with tempfile.TemporaryDirectory() as tmp:
                chained = os.path.join(tmp, "chained.sam")
                chain_sam_file(
                    output_sam_file, chained, read_fastq_file,
                    reference_fasta_file,
                )
                opts = dc_replace(
                    em_options or EmOptions(band_width=spec.band_width),
                    use_mesh=True,
                )
                if opts.checkpoint_path is None:
                    # shared-FS path so every host resumes in lockstep
                    opts = dc_replace(
                        opts, checkpoint_path=hmm_file_to_train + ".ckpt.npz"
                    )
                # expectations psum over the global mesh: every host
                # computes the identical model; host 0 owns the files
                model = learn_model_from_sam_file(
                    chained, reference_fasta_file, hmm_file_to_train,
                    opts, write_files=pi == 0,
                )
        # realign: chain deterministically everywhere, realign a strided
        # record shard each, host 0 splices chained order back together
        with tempfile.TemporaryDirectory() as tmp:
            src = os.path.join(tmp, "temp.sam")
            shutil.copyfile(output_sam_file, src)
            dist.barrier("precopy:" + output_sam_file)
            realign_sam_file(
                src,
                "%s.rshard%d" % (output_sam_file, pi),
                read_fastq_file,
                reference_fasta_file,
                gap_gamma=spec.gap_gamma,
                match_gamma=spec.match_gamma,
                hmm_model=model,
                band_width=spec.band_width,
                shard=(pi, pc),
            )
            dist.barrier("realign:" + output_sam_file)
            if pi == 0:
                dist.merge_sam_shards(
                    [
                        "%s.rshard%d" % (output_sam_file, i)
                        for i in range(pc)
                    ],
                    output_sam_file,
                    order="interleave",
                )
            dist.barrier("realignmerge:" + output_sam_file)


def _inplace_chain(spec, read_fastq_file, reference_fasta_file, sam_path):
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "temp.sam")
        os.replace(sam_path, src)
        chain_sam_file(src, sam_path, read_fastq_file, reference_fasta_file)


def _inplace_realign(
    spec, read_fastq_file, reference_fasta_file, sam_path, model
):
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "temp.sam")
        os.replace(sam_path, src)
        realign_sam_file(
            src,
            sam_path,
            read_fastq_file,
            reference_fasta_file,
            gap_gamma=spec.gap_gamma,
            match_gamma=spec.match_gamma,
            hmm_model=model,
            band_width=spec.band_width,
        )
