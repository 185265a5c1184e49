"""Baum-Welch EM training of the pair-HMM on device.

Replaces ``cactus_expectationMaximisation.expectationMaximisationTrials``
as driven by the reference at
/root/reference/nanopore/analyses/utils.py:471-538: multi-trial
random-restart Baum-Welch where each iteration's E-step is the banded
forward/backward over every (read, ref) global alignment — the hottest
loop of the whole reference system (SURVEY.md section 3.3).  Here the
E-step is one batched kernel call per shape bucket; expectation tensors
are plain sums, so under a sharded mesh they all-reduce with a psum and
the M-step is replicated arithmetic.

Reference option parity (utils.py:509-523): fiveStateAsymmetric model,
randomStart, trials=3, iterations=100, maxAlignmentLengthToSample=5e7,
trainEmissions; post-processing flattens indel emissions and renormalises
match emissions to GC 0.5 (utils.py:531-538).
"""

from __future__ import annotations

import numpy as np
from dataclasses import dataclass

from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.io.encoding import encode
from nanopore_tpu.io.sam import SamReader
from nanopore_tpu.io.seqio import read_fasta_dict
from nanopore_tpu.ops.pairhmm import (
    make_kernel_params,
    prepare_banded_batch,
    em_expectations,
    BandedBatch,
)


@dataclass
class EmOptions:
    trials: int = 3
    iterations: int = 100
    max_sample_bases: int = 50_000_000  # maxAlignmentLengthToSample
    band_width: int = 64
    batch_size: int = 4
    seed: int = 0
    pseudocount: float = 1e-6
    convergence_tol: float = 1e-4  # relative loglik change to stop early
    use_mesh: bool = False  # shard over (dp, trial) when devices > 1
    # checkpointed-backward segment length (diagonals): the E-step never
    # stores the O(K) forward lattice, so memory is O(K/seg + seg) and
    # long reads train at full batch (see ops.pairhmm.em_expectations)
    remat_segment: int = 512


@dataclass
class EmResult:
    model: PairHmmModel  # best trial, unnormalised
    trial_models: list[PairHmmModel]
    running_likelihoods: list[list[float]]


def _m_step(
    model: PairHmmModel,
    trans: np.ndarray,
    emis: np.ndarray,
    pseudocount: float,
) -> PairHmmModel:
    structure = (model.transitions > 0).astype(np.float64)
    t = trans * structure + pseudocount * structure
    t = t / np.maximum(t.sum(axis=1, keepdims=True), 1e-30)
    e = emis + pseudocount
    e = e / np.maximum(e.sum(axis=1, keepdims=True), 1e-30)
    out = PairHmmModel(
        transitions=t,
        emissions=e,
        likelihood=model.likelihood,
        model_type=model.model_type,
    )
    return out


def em_train(
    pairs: list[tuple[np.ndarray, np.ndarray, list[tuple[int, int]]]],
    options: EmOptions | None = None,
) -> EmResult:
    """Multi-trial Baum-Welch over (ref_codes, read_codes, guide) pairs."""
    opts = options or EmOptions()
    rng = np.random.default_rng(opts.seed)

    # sampling cap (maxAlignmentLengthToSample, utils.py:517)
    kept, total = [], 0
    for pair in pairs:
        total += len(pair[1])
        if total > opts.max_sample_bases:
            break
        kept.append(pair)
    assert kept, "no alignments to train on"

    if opts.use_mesh:
        return _em_train_sharded(kept, opts)

    # batches are shape-stable across iterations: prepare once
    batches: list[BandedBatch] = []
    for s in range(0, len(kept), opts.batch_size):
        batches.append(
            prepare_banded_batch(
                kept[s : s + opts.batch_size], band_width=opts.band_width
            )
        )

    trial_models: list[PairHmmModel] = []
    running: list[list[float]] = []
    for _trial in range(opts.trials):
        model = PairHmmModel.random(rng)
        trace: list[float] = []
        prev_ll = None
        for _it in range(opts.iterations):
            params = make_kernel_params(model)
            trans = np.zeros((5, 5))
            emis = np.zeros((5, 16))
            loglik = 0.0
            for batch in batches:
                out = em_expectations(
                    batch, params, segment_size=opts.remat_segment
                )
                trans += np.asarray(out["trans"], np.float64).sum(axis=0)
                emis += np.asarray(out["emis"], np.float64).sum(axis=0)
                loglik += float(np.asarray(out["loglik"]).sum())
            trace.append(loglik)
            model = _m_step(model, trans, emis, opts.pseudocount)
            model.likelihood = loglik
            if prev_ll is not None and abs(loglik - prev_ll) <= (
                opts.convergence_tol * abs(prev_ll)
            ):
                break
            prev_ll = loglik
        trial_models.append(model)
        running.append(trace)

    best = max(trial_models, key=lambda mm: mm.likelihood)
    return EmResult(
        model=best, trial_models=trial_models, running_likelihoods=running
    )


def _em_train_sharded(kept, opts: EmOptions) -> EmResult:
    """Mesh-sharded EM: one padded batch, reads over dp, trials over
    the trial axis (parallel/sharded_em)."""
    import jax

    from nanopore_tpu.parallel.mesh import make_mesh, DP_AXIS
    from nanopore_tpu.parallel.sharded_em import sharded_em_train

    mesh = make_mesh(n_trials=opts.trials)
    dp = mesh.shape[DP_AXIS]
    pad = (-len(kept)) % dp
    weights = np.concatenate(
        [np.ones(len(kept), np.float32), np.zeros(pad, np.float32)]
    )
    padded = kept + [kept[0]] * pad
    batch = prepare_banded_batch(padded, band_width=opts.band_width)
    model, traces = sharded_em_train(
        batch,
        mesh,
        trials=opts.trials,
        iterations=opts.iterations,
        seed=opts.seed,
        convergence_tol=opts.convergence_tol,
        weights=weights,
    )
    # per-trial final models are not retained by the sharded path beyond
    # the winner; replicate it so downstream XML averaging still works
    return EmResult(
        model=model,
        trial_models=[model],
        running_likelihoods=traces,
    )


def learn_model_from_sam_file(
    sam_path: str,
    reference_fasta_path: str,
    output_model_path: str,
    options: EmOptions | None = None,
) -> PairHmmModel:
    """EM on a chained SAM; write hmm.txt + hmm.txt.xml.

    Semantics of learnModelFromSamFileTargetFn (+2) (utils.py:471-538):
    train on the global alignments (in alignment orientation — the
    reference feeds reverse-complemented reads under ``_reverse`` names,
    utils.py:482-499, which is exactly the record's stored seq), pick the
    best of the random-restart trials, then flatten indel emissions and
    renormalise match emissions to 50% GC.  The XML flavour carries the
    across-trial avg/std and per-trial running likelihoods consumed by
    the Hmm analysis (reference analyses/hmm.py:31-47,82-84).
    """
    ref_seqs = read_fasta_dict(reference_fasta_path)
    pairs = []
    for rec in SamReader(sam_path).mapped():
        assert rec.pos == 0, "EM requires chained global records"
        x = encode(ref_seqs[rec.rname])
        y = encode(rec.seq)
        pairs.append((x, y, rec.cigar))
    result = em_train(pairs, options)

    unnormalised = result.model
    unnormalised.write(output_model_path + "_unnormalised")

    final = PairHmmModel(
        transitions=unnormalised.transitions.copy(),
        emissions=unnormalised.emissions.copy(),
        likelihood=unnormalised.likelihood,
        model_type=unnormalised.model_type,
    )
    final.set_indel_emissions_flat()
    final.normalise_by_reference_gc_content(0.5)
    final.write(output_model_path)

    t_stack = np.stack([m.transitions for m in result.trial_models])
    e_stack = np.stack([m.emissions for m in result.trial_models])
    xml_model = PairHmmModel(
        transitions=t_stack.mean(axis=0),
        emissions=e_stack.mean(axis=0),
        likelihood=unnormalised.likelihood,
        model_type=unnormalised.model_type,
        running_likelihoods=result.running_likelihoods,
    )
    xml_model.write_xml(
        output_model_path + ".xml",
        transitions_std=t_stack.std(axis=0),
        emissions_std=e_stack.std(axis=0),
    )
    return final
