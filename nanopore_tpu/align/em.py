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

import json
import os

import numpy as np
from dataclasses import dataclass, replace

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
    # shard over a (dp, trial) mesh: None = auto (True on a real
    # multi-chip TPU backend — the most common production config; CPU
    # test meshes opt in explicitly, their single-device path is faster)
    use_mesh: bool | None = None
    # checkpointed-backward segment length (diagonals): the E-step never
    # stores the O(K) forward lattice, so memory is O(K/seg + seg) and
    # long reads train at full batch (see ops.pairhmm.em_expectations)
    remat_segment: int = 512
    # EM window pad (ref bases kept around each aligned span).  Chained
    # global records span the WHOLE reference (utils.py:491-501); on a
    # megabase contig the flanking pure-deletion runs would cost a DP
    # diagonal per ref base per read per iteration.  The lattice is
    # windowed (align.realign.window_global_pair) and the flank mass —
    # which the reference's EM counts, notably the D->D dwell
    # transitions — is restored analytically per iteration
    # (align.flank.em_flank_correction): the banded analogue of
    # --splitMatrixBiggerThanThis=300 (utils.py:511).  None disables
    # windowing (full-reference lattices, the pre-round-5 behaviour).
    window_pad: int | None = 256
    # mid-training checkpoint/resume (SURVEY.md section 5): HMM params +
    # trial/iteration indices + traces saved every `checkpoint_every`
    # iterations; a restarted run resumes from the file instead of
    # retraining (the reference only resumes at whole-model granularity,
    # utils.py:527-528)
    checkpoint_path: str | None = None
    checkpoint_every: int = 10


@dataclass
class EmResult:
    model: PairHmmModel  # best trial, unnormalised
    trial_models: list[PairHmmModel]
    running_likelihoods: list[list[float]]


def save_em_checkpoint(path: str, state: dict) -> None:
    """Atomically persist EM training state (arrays + JSON metadata)."""
    arrays = {k: v for k, v in state.items() if isinstance(v, np.ndarray)}
    meta = {k: v for k, v in state.items() if not isinstance(v, np.ndarray)}
    # pid-suffixed tmp name: two runs sharing an output path (or a
    # retried scheduler task overlapping a hung predecessor) must not
    # interleave writes into the same tmp file
    tmp = "%s.%d.tmp" % (path, os.getpid())
    try:
        with open(tmp, "wb") as fh:
            np.savez(fh, __meta__=json.dumps(meta), **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def em_fingerprint(
    pairs, opts: "EmOptions", sharded: bool = False
) -> dict:
    """Config+data fingerprint stored in checkpoints: a resume is only
    valid when it was written by a run with identical inputs (ADVICE
    round-1: resuming across changed SAM/seed/band silently produced a
    model trained on the old configuration)."""
    import zlib

    crc = 0
    for x, y, _ in pairs:
        crc = zlib.crc32(np.ascontiguousarray(x[:128]).tobytes(), crc)
        crc = zlib.crc32(np.ascontiguousarray(y[:128]).tobytes(), crc)
        crc = zlib.crc32(
            np.array([len(x), len(y)], np.int64).tobytes(), crc
        )
    return {
        "format": "sharded" if sharded else "per_trial",
        "trials": opts.trials,
        "iterations": opts.iterations,
        "seed": opts.seed,
        "band_width": opts.band_width,
        "pseudocount": opts.pseudocount,
        "window_pad": opts.window_pad,
        "n_pairs": len(pairs),
        "data_crc": crc,
    }


def checkpoint_matches(ck: dict | None, fp: dict) -> bool:
    """True when a loaded checkpoint carries exactly fingerprint fp."""
    if ck is None:
        return False
    if any(ck.get(k) != v for k, v in fp.items()):
        import logging

        logging.getLogger("nanopore_tpu").warning(
            "EM checkpoint fingerprint mismatch (stale config/data); "
            "ignoring checkpoint and retraining from scratch"
        )
        return False
    return True


def load_em_checkpoint(path: str) -> dict | None:
    """Load an EM checkpoint written by save_em_checkpoint, or None."""
    if not path or not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as npz:
            state = {
                k: np.asarray(npz[k]) for k in npz.files if k != "__meta__"
            }
            state.update(json.loads(str(npz["__meta__"])))
        return state
    except Exception:
        return None  # corrupt/partial checkpoint: retrain from scratch


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

    # window each global pair to its aligned ref span; flank mass is
    # restored analytically per iteration (EmOptions.window_pad)
    corr_pairs: list = []
    if opts.window_pad is not None:
        from nanopore_tpu.align.realign import window_global_pair

        windowed = []
        for x, y, guide in kept:
            xw, gw, g0, g1 = window_global_pair(
                x, guide, pad=opts.window_pad
            )
            windowed.append((xw, y, gw))
            if g0 > 0 or g1 < len(x):
                corr_pairs.append((x, guide))
        # fingerprint the ORIGINAL pairs (resume safety), train windowed
        fingerprint_pairs = kept
        kept = windowed
    else:
        fingerprint_pairs = kept

    use_mesh = opts.use_mesh
    if use_mesh is None:
        import jax

        use_mesh = jax.device_count() > 1 and jax.default_backend() in (
            "tpu", "axon",
        )
    if use_mesh:
        return _em_train_sharded(kept, opts, corr_pairs, fingerprint_pairs)

    # batches are shape-stable across iterations: prepare once; on TPU
    # a PreparedEm plan keeps the packed codes device-resident (built
    # by the fused direct pack) and swaps only the model scalars each
    # iteration (Pallas kernel); elsewhere the module-level
    # em_expectations runs per batch.  Batches round-robin over the
    # local devices (single-process data parallelism — each batch's
    # E-step runs on its own chip).
    from nanopore_tpu.ops.dispatch import (
        PreparedEm,
        _PALLAS_BAND_WIDTHS,
        _place_batch,
        kernel_choice,
        local_dp_devices,
        prepared_from_pairs,
    )

    devices = local_dp_devices()
    use_pallas = (
        kernel_choice() == "pallas"
        and opts.band_width in _PALLAS_BAND_WIDTHS
    )
    batches: list = []
    preps: list = []
    params0 = make_kernel_params(PairHmmModel.default())
    for i, s in enumerate(range(0, len(kept), opts.batch_size)):
        chunk = kept[s : s + opts.batch_size]
        dev = devices[i % len(devices)]
        if use_pallas:
            prep = prepared_from_pairs(
                {"segment_size": opts.remat_segment, "device": dev},
                chunk,
                params0,
                band_width=opts.band_width,
                prepared_cls=PreparedEm,
            )
            batches.append(prep.batch)
            preps.append(prep)
        else:
            b = _place_batch(
                prepare_banded_batch(chunk, band_width=opts.band_width),
                dev,
            )
            batches.append(b)
            preps.append(None)

    trial_models: list[PairHmmModel] = []
    running: list[list[float]] = []
    fingerprint = em_fingerprint(fingerprint_pairs, opts)
    ck = (
        load_em_checkpoint(opts.checkpoint_path)
        if opts.checkpoint_path
        else None
    )
    if not checkpoint_matches(ck, fingerprint):
        ck = None
    start_trial, start_iter = 0, 0
    resumed_model = None
    resumed_trace: list[float] = []
    resumed_prev = None
    if ck is not None:
        start_trial = int(ck["trial"])
        start_iter = int(ck["iteration"])
        # one PairHmmModel.random draw per STARTED trial keeps the rng
        # stream identical to an uninterrupted run (iteration 0 means the
        # trial has not drawn its random init yet)
        started = start_trial + (1 if start_iter > 0 else 0)
        replay = [PairHmmModel.random(rng) for _ in range(started)]
        del replay
        for d in range(start_trial):
            mm = PairHmmModel(
                transitions=np.asarray(ck["done_t"][d], np.float64),
                emissions=np.asarray(ck["done_e"][d], np.float64),
                likelihood=float(ck["done_ll"][d]),
            )
            trial_models.append(mm)
            running.append(list(ck["traces"][d]))
        if start_iter > 0:
            resumed_model = PairHmmModel(
                transitions=np.asarray(ck["t"], np.float64),
                emissions=np.asarray(ck["e"], np.float64),
                likelihood=float(ck["likelihood"]),
            )
            resumed_trace = list(ck["traces"][start_trial])
            resumed_prev = ck["prev_ll"]

    def _dump(trial, iteration, model, trace, prev_ll):
        if not opts.checkpoint_path:
            return
        save_em_checkpoint(
            opts.checkpoint_path,
            {
                **fingerprint,
                "trial": trial,
                "iteration": iteration,
                "t": np.asarray(model.transitions, np.float64),
                "e": np.asarray(model.emissions, np.float64),
                "likelihood": float(model.likelihood or 0.0),
                "prev_ll": prev_ll,
                "done_t": np.stack(
                    [mm.transitions for mm in trial_models]
                )
                if trial_models
                else np.zeros((0, 5, 5)),
                "done_e": np.stack([mm.emissions for mm in trial_models])
                if trial_models
                else np.zeros((0, 5, 16)),
                "done_ll": [float(mm.likelihood) for mm in trial_models],
                "traces": running + [trace],
            },
        )

    for trial in range(start_trial, opts.trials):
        if trial == start_trial and resumed_model is not None:
            model = resumed_model
            trace = resumed_trace
            prev_ll = resumed_prev
            it0 = start_iter
        else:
            model = PairHmmModel.random(rng)
            trace = []
            prev_ll = None
            it0 = 0
        for it in range(it0, opts.iterations):
            params = make_kernel_params(model)
            trans = np.zeros((5, 5))
            emis = np.zeros((5, 16))
            loglik = 0.0
            # launch every batch's E-step first (async dispatch): the
            # round-robin devices compute concurrently; materialise after
            outs = [
                prep.run(params)
                if prep is not None
                else em_expectations(
                    batch, params, segment_size=opts.remat_segment
                )
                for batch, prep in zip(batches, preps)
            ]
            if corr_pairs:
                # analytic flank mass of the windowed pairs under the
                # CURRENT model (align.flank) — computed on the host
                # while the device E-steps above are still in flight
                from nanopore_tpu.align.flank import (
                    corridor_tables,
                    em_flank_correction,
                )

                t_c, eg_c = corridor_tables(model)
                for x_full, guide_full in corr_pairs:
                    dt, de, dll = em_flank_correction(
                        x_full, guide_full, opts.window_pad, t_c, eg_c
                    )
                    trans += dt
                    emis += de
                    loglik += dll
            for out in outs:
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
            if (it + 1) % opts.checkpoint_every == 0:
                _dump(trial, it + 1, model, trace, prev_ll)
        trial_models.append(model)
        running.append(trace)
        if trial + 1 < opts.trials:
            _dump(trial + 1, 0, model, [], None)
    if opts.checkpoint_path and os.path.exists(opts.checkpoint_path):
        os.remove(opts.checkpoint_path)  # training complete

    best = max(trial_models, key=lambda mm: mm.likelihood)
    return EmResult(
        model=best, trial_models=trial_models, running_likelihoods=running
    )


def _sum_flank_corrections(corr_pairs, window_pad: int):
    """Build the per-model summed flank-correction callable for
    sharded_em_train: (transitions, emissions) -> (ct, ce, cll)."""
    from nanopore_tpu.align.flank import (
        corridor_tables,
        em_flank_correction,
    )
    from nanopore_tpu.align.model import PairHmmModel

    def correction(transitions, emissions):
        mm = PairHmmModel(
            transitions=np.asarray(transitions, np.float64),
            emissions=np.asarray(emissions, np.float64),
        )
        t_c, eg_c = corridor_tables(mm)
        ct = np.zeros((5, 5))
        ce = np.zeros((5, 16))
        cll = 0.0
        for x, guide in corr_pairs:
            dt, de, dll = em_flank_correction(
                x, guide, window_pad, t_c, eg_c
            )
            ct += dt
            ce += de
            cll += dll
        return ct, ce, cll

    return correction


def _em_train_sharded(
    kept, opts: EmOptions, corr_pairs=None, fingerprint_pairs=None
) -> EmResult:
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
    model, trial_models, traces = sharded_em_train(
        batch,
        mesh,
        flank_correction=(
            _sum_flank_corrections(corr_pairs, opts.window_pad)
            if corr_pairs
            else None
        ),
        trials=opts.trials,
        iterations=opts.iterations,
        seed=opts.seed,
        convergence_tol=opts.convergence_tol,
        weights=weights,
        checkpoint_path=opts.checkpoint_path,
        checkpoint_every=opts.checkpoint_every,
        fingerprint=em_fingerprint(
            fingerprint_pairs or kept, opts, sharded=True
        ),
        pseudocount=opts.pseudocount,
    )
    return EmResult(
        model=model,
        trial_models=trial_models,
        running_likelihoods=traces,
    )


def learn_model_from_sam_file(
    sam_path: str,
    reference_fasta_path: str,
    output_model_path: str,
    options: EmOptions | None = None,
    write_files: bool = True,
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
    options = options or EmOptions()
    if options.checkpoint_path is None:
        # mid-training resume by default: a killed/restarted pipeline
        # picks EM up at the last checkpointed (trial, iteration) instead
        # of retraining (file removed on completion)
        options = replace(
            options, checkpoint_path=output_model_path + ".ckpt.npz"
        )
    result = em_train(pairs, options)

    unnormalised = result.model
    if write_files:
        unnormalised.write(output_model_path + "_unnormalised")

    final = PairHmmModel(
        transitions=unnormalised.transitions.copy(),
        emissions=unnormalised.emissions.copy(),
        likelihood=unnormalised.likelihood,
        model_type=unnormalised.model_type,
    )
    final.set_indel_emissions_flat()
    final.normalise_by_reference_gc_content(0.5)
    if not write_files:
        # multi-host: non-coordinators compute the identical model (the
        # expectations are global psums) but only host 0 owns the files
        return final
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
