"""Sharded Baum-Welch: the multi-chip EM training step.

One jitted step = E-step (batched banded forward/backward) + M-step,
sharded over a (dp, trial) mesh: read batches sharded over ``dp`` (their
expectation sums become psums over ICI), trial model parameters sharded
over ``trial`` (random restarts train concurrently — the reference runs
them as separate jobTree processes, utils.py:514).  The M-step is tiny
replicated arithmetic.

This is the training step that ``__graft_entry__.dryrun_multichip``
compiles over a virtual mesh, and that pod-scale EM uses on real slices.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from jax.sharding import NamedSharding, PartitionSpec as P

from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.ops.pairhmm import (
    BandedBatch,
    kernel_tables,
    _em_expectations_single,
)
from nanopore_tpu.parallel.mesh import DP_AXIS, TRIAL_AXIS


@functools.partial(
    jax.jit, static_argnames=("band_width", "pseudocount", "remat_segment")
)
def em_train_step(
    transitions,  # (T, 5, 5) per-trial
    emissions,  # (T, 5, 16) per-trial
    xc,  # (B, K+1, W) band ref codes
    yc,  # (B, K+1, W) band read codes
    xn,  # (B, K+1, W)
    yn,  # (B, K+1, W)
    offsets,  # (B, K+1)
    m,  # (B,)
    n,  # (B,)
    k_end,  # (B,)
    weights,  # (B,) 0/1 mask for padding rows
    band_width: int,
    pseudocount: float = 1e-6,
    remat_segment: int = 512,
):
    """One EM iteration for all trials.  Returns (new_t, new_e, loglik(T,)).

    The E-step uses the checkpointed/rematerialised backward — no O(K)
    stored lattice per read, so DP shards stay small in HBM.
    """

    def one_pair(params, *elem):
        out = _em_expectations_single(
            params, (*elem, band_width), remat_segment
        )
        return out["trans"], out["emis"], out["loglik"]

    def one_trial(t, e):
        params = kernel_tables(t, e)
        trans_b, emis_b, ll_b = jax.vmap(
            lambda *elem: one_pair(params, *elem)
        )(xc, yc, xn, yn, offsets, m, n, k_end)
        w = weights[:, None, None]
        trans = (trans_b * w).sum(axis=0)
        emis = (emis_b * w).sum(axis=0)
        loglik = (ll_b * weights).sum()
        # M-step preserving the transition sparsity structure
        structure = (t > 0).astype(trans.dtype)
        new_t = trans * structure + pseudocount * structure
        new_t = new_t / jnp.maximum(new_t.sum(axis=1, keepdims=True), 1e-30)
        new_e = emis + pseudocount
        new_e = new_e / jnp.maximum(new_e.sum(axis=1, keepdims=True), 1e-30)
        return new_t, new_e, loglik

    return jax.vmap(one_trial)(transitions, emissions)


def make_sharded_em_step(mesh, band_width: int, pseudocount: float = 1e-6):
    """Bind em_train_step to a mesh with (dp, trial) shardings."""
    trial_s = NamedSharding(mesh, P(TRIAL_AXIS))
    dp_s = NamedSharding(mesh, P(DP_AXIS))
    rep = NamedSharding(mesh, P())

    multiproc = jax.process_count() > 1

    def put(arr, sharding):
        if multiproc:
            # every process holds the identical full value; hand each
            # its addressable shards (multihost_worker pattern)
            arr = np.asarray(arr)
            return jax.make_array_from_callback(
                arr.shape, sharding, lambda idx: arr[idx]
            )
        return jax.device_put(arr, sharding)

    def step(trial_models, batch_arrays):
        t, e = trial_models
        xc, yc, xn, yn, offsets, m, n, k_end, w = batch_arrays
        t = put(t, trial_s)
        e = put(e, trial_s)
        xc = put(xc, dp_s)
        yc = put(yc, dp_s)
        xn = put(xn, dp_s)
        yn = put(yn, dp_s)
        offsets = put(offsets, dp_s)
        m = put(m, dp_s)
        n = put(n, dp_s)
        k_end = put(k_end, dp_s)
        w = put(w, dp_s)
        out = em_train_step(
            t, e, xc, yc, xn, yn, offsets, m, n, k_end, w, band_width,
            pseudocount=pseudocount,
        )
        if multiproc:
            from jax.experimental import multihost_utils

            # outputs are sharded over non-addressable devices; gather
            # the replicated global values so the host loop sees them
            # (reshape asserts the gather returned global, not stacked)
            shapes = [o.shape for o in out]
            out = tuple(
                np.asarray(
                    multihost_utils.process_allgather(o, tiled=True)
                ).reshape(shape)
                for o, shape in zip(out, shapes)
            )
        return out

    return step


def sharded_em_train(
    batch: BandedBatch,
    mesh,
    trials: int = 3,
    iterations: int = 100,
    seed: int = 0,
    convergence_tol: float = 1e-4,
    weights: np.ndarray | None = None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 10,
    fingerprint: dict | None = None,
    pseudocount: float = 1e-6,
) -> tuple[PairHmmModel, list[PairHmmModel], list[list[float]]]:
    """Multi-trial EM over a prepared batch on a device mesh.

    Returns (best model, all per-trial models, per-trial running
    likelihoods) — matching the non-mesh path's trial statistics so the
    hmm.txt.xml across-trial avg/std (reference analyses/hmm.py:31-47)
    stays non-degenerate in mesh mode.  All trials advance together
    (they are a mesh axis); convergence is tracked PER TRIAL: a trial's
    trace and final parameters freeze at its own convergence iteration,
    and the loop stops when every trial has converged.
    """
    from nanopore_tpu.align.em import (
        checkpoint_matches,
        load_em_checkpoint,
        save_em_checkpoint,
    )

    rng = np.random.default_rng(seed)
    models = [PairHmmModel.random(rng) for _ in range(trials)]
    t = np.stack([mm.transitions for mm in models]).astype(np.float32)
    e = np.stack([mm.emissions for mm in models]).astype(np.float32)
    B = batch.xc.shape[0]
    w = (
        np.ones(B, np.float32)
        if weights is None
        else np.asarray(weights, np.float32)
    )
    step = make_sharded_em_step(mesh, batch.band_width, pseudocount)
    arrays = (
        batch.xc, batch.yc, batch.xn, batch.yn, batch.offsets, batch.m,
        batch.n, batch.k_end, w,
    )
    traces: list[list[float]] = [[] for _ in range(trials)]
    prev = np.full(trials, np.nan)
    converged = np.zeros(trials, bool)
    final_t = t.astype(np.float64).copy()
    final_e = e.astype(np.float64).copy()
    start_iter = 0
    ck = load_em_checkpoint(checkpoint_path) if checkpoint_path else None
    if fingerprint is not None:
        if not checkpoint_matches(ck, fingerprint):
            ck = None
    elif ck is not None and (
        ck.get("format") != "sharded" or int(ck.get("trials", -1)) != trials
    ):
        ck = None
    if ck is not None:
        start_iter = int(ck["iteration"])
        t = np.asarray(ck["t"], np.float32)
        e = np.asarray(ck["e"], np.float32)
        traces = [list(tr) for tr in ck["traces"]]
        prev = np.asarray(ck["prev_ll_per_trial"], np.float64)
        converged = np.asarray(ck["converged"], bool).copy()
        final_t = np.asarray(ck["final_t"], np.float64).copy()
        final_e = np.asarray(ck["final_e"], np.float64).copy()
    for it in range(start_iter, iterations):
        t_new, e_new, ll = step((t, e), arrays)
        ll = np.asarray(ll, np.float64)
        t, e = np.asarray(t_new), np.asarray(e_new)
        for j in range(trials):
            if not converged[j]:
                traces[j].append(float(ll[j]))
        newly = (
            (~converged)
            & ~np.isnan(prev)
            & (np.abs(ll - prev) <= convergence_tol * np.abs(prev))
        )
        for j in np.nonzero(newly)[0]:
            final_t[j] = t[j]
            final_e[j] = e[j]
            converged[j] = True
        prev = np.where(converged, prev, ll)
        if converged.all():
            break
        if (
            checkpoint_path
            and (it + 1) % checkpoint_every == 0
            and jax.process_index() == 0
        ):
            save_em_checkpoint(
                checkpoint_path,
                {
                    **(fingerprint or {"format": "sharded",
                                       "trials": trials}),
                    "iteration": it + 1,
                    "t": np.asarray(t, np.float64),
                    "e": np.asarray(e, np.float64),
                    "traces": traces,
                    "prev_ll_per_trial": prev,
                    "converged": converged,
                    "final_t": final_t,
                    "final_e": final_e,
                },
            )
    for j in range(trials):
        if not converged[j]:
            final_t[j] = t[j]
            final_e[j] = e[j]
    if checkpoint_path and jax.process_index() == 0:
        import os

        if os.path.exists(checkpoint_path):
            os.remove(checkpoint_path)
    trial_models = [
        PairHmmModel(
            transitions=final_t[j],
            emissions=final_e[j],
            likelihood=traces[j][-1] if traces[j] else 0.0,
        )
        for j in range(trials)
    ]
    best = (
        int(np.argmax([mm.likelihood for mm in trial_models]))
        if any(traces)
        else 0
    )
    return trial_models[best], trial_models, traces
