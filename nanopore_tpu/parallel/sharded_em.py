"""Sharded Baum-Welch: the multi-chip EM training step.

One jitted step = E-step (batched banded forward/backward) + M-step,
sharded over a (dp, trial) mesh: read batches sharded over ``dp`` (their
expectation sums become psums over ICI), trial model parameters sharded
over ``trial`` (random restarts train concurrently — the reference runs
them as separate jobTree processes, utils.py:514).  The M-step is tiny
replicated arithmetic.

On TPU the E-step runs the fused Pallas realign kernel inside a
``shard_map`` (make_sharded_em_step_pallas): the packed code tensors
are dp-sharded ONCE and stay device-resident for the whole training
run, model parameters are runtime SMEM scalars swapped per iteration/
trial, and the expectation tensors psum over ICI — pod-scale EM runs at
the same cells/s as the single-chip kernel.  Off-TPU (CPU meshes, odd
band widths) the XLA rematerialised E-step serves instead.

This is the training step that ``__graft_entry__.dryrun_multichip``
compiles over a virtual mesh, and that pod-scale EM uses on real slices.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map

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
    corr_t=None,  # (T, 5, 5) analytic flank corrections (align.flank)
    corr_e=None,  # (T, 5, 16)
    corr_ll=None,  # (T,)
):
    """One EM iteration for all trials.  Returns (new_t, new_e, loglik(T,)).

    The E-step uses the checkpointed/rematerialised backward — no O(K)
    stored lattice per read, so DP shards stay small in HBM.  The
    ``corr_*`` tensors carry the host-computed analytic flank
    contributions of windowed global pairs (align.flank) and are added
    to the expectation sums before the M-step.
    """

    T = transitions.shape[0]
    if corr_t is None:
        corr_t = jnp.zeros((T, 5, 5), jnp.float32)
    if corr_e is None:
        corr_e = jnp.zeros((T, 5, 16), jnp.float32)
    if corr_ll is None:
        corr_ll = jnp.zeros((T,), jnp.float32)

    def one_pair(params, *elem):
        out = _em_expectations_single(
            params, (*elem, band_width), remat_segment
        )
        return out["trans"], out["emis"], out["loglik"]

    def one_trial(t, e, ct, ce, cll):
        params = kernel_tables(t, e)
        trans_b, emis_b, ll_b = jax.vmap(
            lambda *elem: one_pair(params, *elem)
        )(xc, yc, xn, yn, offsets, m, n, k_end)
        w = weights[:, None, None]
        trans = (trans_b * w).sum(axis=0) + ct
        emis = (emis_b * w).sum(axis=0) + ce
        loglik = (ll_b * weights).sum() + cll
        # M-step preserving the transition sparsity structure
        structure = (t > 0).astype(trans.dtype)
        new_t = trans * structure + pseudocount * structure
        new_t = new_t / jnp.maximum(new_t.sum(axis=1, keepdims=True), 1e-30)
        new_e = emis + pseudocount
        new_e = new_e / jnp.maximum(new_e.sum(axis=1, keepdims=True), 1e-30)
        return new_t, new_e, loglik

    return jax.vmap(one_trial)(
        transitions, emissions, corr_t, corr_e, corr_ll
    )


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

    def step(trial_models, batch_arrays, corrections=None):
        t, e = trial_models
        xc, yc, xn, yn, offsets, m, n, k_end, w = batch_arrays
        T = t.shape[0]
        if corrections is None:
            corrections = (
                np.zeros((T, 5, 5), np.float32),
                np.zeros((T, 5, 16), np.float32),
                np.zeros((T,), np.float32),
            )
        ct, ce, cll = corrections
        t = put(t, trial_s)
        e = put(e, trial_s)
        ct = put(np.asarray(ct, np.float32), trial_s)
        ce = put(np.asarray(ce, np.float32), trial_s)
        cll = put(np.asarray(cll, np.float32), trial_s)
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
            pseudocount=pseudocount, corr_t=ct, corr_e=ce, corr_ll=cll,
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


def make_sharded_em_step_pallas(
    mesh,
    batch: BandedBatch,
    weights: np.ndarray,
    pseudocount: float = 1e-6,
    interpret: bool = False,
):
    """EM step whose E-step is the fused Pallas kernel under shard_map.

    The kernel-packed code tensors (ops.pairhmm_pallas_realign) are
    built once here, padded so their batch-tile axis divides the dp
    axis, and sharded P(dp) — every iteration then reuses them; only
    the per-trial scalar tables (25+36+30 floats) travel per step.
    Per-trial expectation sums psum over dp; the M-step is replicated
    per trial column.  Returns step((t (T,5,5), e (T,5,16)), _ignored)
    -> (new_t, new_e, loglik (T,)) matching make_sharded_em_step.
    """
    from nanopore_tpu.ops.pairhmm_pallas_realign import (
        BT,
        _pallas_realign_call,
        _param_scalars,
        prepare_pallas_realign,
    )

    dp = mesh.shape[DP_AXIS]
    tr = mesh.shape[TRIAL_AXIS]
    dummy = kernel_tables(
        jnp.asarray(np.full((5, 5), 0.2, np.float32)),
        jnp.asarray(np.full((5, 16), 1 / 16, np.float32)),
    )
    prep = prepare_pallas_realign(batch, dummy)
    xyc, kend = prep["xyc"], prep["kend"]
    NB, k_pad, W = prep["NB"], prep["k_pad"], prep["W"]
    # pad the batch-tile axis so it divides dp (sentinel tiles with
    # kend=-1 contribute exactly zero expectations and loglik)
    nb_pad = (-NB) % dp
    if nb_pad:
        sent = np.full((nb_pad,) + xyc.shape[1:], (5 << 3) | 5, np.int8)
        xyc = np.concatenate([np.asarray(xyc), sent])
        kend = np.concatenate(
            [np.asarray(kend), np.full((nb_pad, 1, BT), -1, np.int32)]
        )
        NB += nb_pad
    w = np.zeros((NB, 1, BT), np.float32)
    w.reshape(-1)[: len(weights)] = np.asarray(weights, np.float32)
    NB_local = NB // dp
    # [gapGamma, matchGamma, expThreshold] — the E-step ignores all
    # three (no MEA/posterior outputs requested), but the kernel's
    # scalar table has three slots
    ggmg = np.array([0.5, 0.0, 1e-3], np.float32)

    multiproc = jax.process_count() > 1

    def put(arr, spec):
        sharding = NamedSharding(mesh, spec)
        arr = np.asarray(arr)
        if multiproc:
            return jax.make_array_from_callback(
                arr.shape, sharding, lambda idx: arr[idx]
            )
        return jax.device_put(arr, sharding)

    xyc_d = put(xyc, P(DP_AXIS))
    kend_d = put(kend, P(DP_AXIS))
    w_d = put(w, P(DP_AXIS))
    ggmg_d = put(ggmg, P())

    def _body(
        tf, emf, egf, tstack, ct_l, ce_l, cll_l, kend_l, xyc_l, w_l,
        ggmg_l,
    ):
        T_local = tf.shape[0]
        outs_t, outs_e, outs_ll = [], [], []
        for j in range(T_local):
            out = _pallas_realign_call(
                tf[j], emf[j], egf[j], ggmg_l, kend_l, xyc_l,
                k_pad, NB_local, W, interpret,
            )
            wl = w_l.reshape(-1)
            trans = (out["trans"] * wl[:, None, None]).sum(axis=0)
            emis = (out["emis"] * wl[:, None, None]).sum(axis=0)
            ll = (out["loglik"] * wl).sum()
            trans = lax.psum(trans, DP_AXIS) + ct_l[j]
            emis = lax.psum(emis, DP_AXIS) + ce_l[j]
            ll = lax.psum(ll, DP_AXIS) + cll_l[j]
            structure = (tstack[j] > 0).astype(trans.dtype)
            new_t = trans * structure + pseudocount * structure
            new_t = new_t / jnp.maximum(
                new_t.sum(axis=1, keepdims=True), 1e-30
            )
            new_e = emis + pseudocount
            new_e = new_e / jnp.maximum(
                new_e.sum(axis=1, keepdims=True), 1e-30
            )
            outs_t.append(new_t)
            outs_e.append(new_e)
            outs_ll.append(ll)
        return (
            jnp.stack(outs_t),
            jnp.stack(outs_e),
            jnp.stack(outs_ll),
        )

    sharded = shard_map(
        _body,
        mesh=mesh,
        in_specs=(
            P(TRIAL_AXIS), P(TRIAL_AXIS), P(TRIAL_AXIS), P(TRIAL_AXIS),
            P(TRIAL_AXIS), P(TRIAL_AXIS), P(TRIAL_AXIS),
            P(DP_AXIS), P(DP_AXIS), P(DP_AXIS), P(),
        ),
        out_specs=(P(TRIAL_AXIS), P(TRIAL_AXIS), P(TRIAL_AXIS)),
        check_vma=False,
    )

    def step(trial_models, _arrays_ignored=None, corrections=None):
        t, e = trial_models
        T = t.shape[0]
        assert T % tr == 0, "trials must divide the trial mesh axis"
        if corrections is None:
            corrections = (
                np.zeros((T, 5, 5), np.float32),
                np.zeros((T, 5, 16), np.float32),
                np.zeros((T,), np.float32),
            )
        ct, ce, cll = corrections
        scal = [
            _param_scalars(
                kernel_tables(
                    jnp.asarray(t[j], jnp.float32),
                    jnp.asarray(e[j], jnp.float32),
                )
            )
            for j in range(T)
        ]
        tf = put(np.stack([s[0] for s in scal]), P(TRIAL_AXIS))
        emf = put(np.stack([s[1] for s in scal]), P(TRIAL_AXIS))
        egf = put(np.stack([s[2] for s in scal]), P(TRIAL_AXIS))
        ts = put(np.asarray(t, np.float32), P(TRIAL_AXIS))
        ct_d = put(np.asarray(ct, np.float32), P(TRIAL_AXIS))
        ce_d = put(np.asarray(ce, np.float32), P(TRIAL_AXIS))
        cll_d = put(np.asarray(cll, np.float32), P(TRIAL_AXIS))
        out = sharded(
            tf, emf, egf, ts, ct_d, ce_d, cll_d, kend_d, xyc_d, w_d,
            ggmg_d,
        )
        if multiproc:
            from jax.experimental import multihost_utils

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
    flank_correction=None,
) -> tuple[PairHmmModel, list[PairHmmModel], list[list[float]]]:
    """Multi-trial EM over a prepared batch on a device mesh.

    ``flank_correction``: optional callable
    ``(transitions (5,5) f64, emissions (5,16) f64) -> (ct, ce, cll)``
    returning the summed analytic flank contributions of windowed
    global pairs under that model (align.flank.em_flank_correction);
    evaluated per trial per iteration on the host and added to the
    psum'd expectations before the on-device M-step.

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
    from nanopore_tpu.ops.dispatch import kernel_choice, pallas_eligible

    if (
        kernel_choice() == "pallas"
        and pallas_eligible(batch)
        and trials % mesh.shape[TRIAL_AXIS] == 0
    ):
        step = make_sharded_em_step_pallas(mesh, batch, w, pseudocount)
    else:
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
        corrections = None
        if flank_correction is not None:
            per = [
                flank_correction(
                    np.asarray(t[j], np.float64),
                    np.asarray(e[j], np.float64),
                )
                for j in range(trials)
            ]
            corrections = (
                np.stack([c[0] for c in per]),
                np.stack([c[1] for c in per]),
                np.array([c[2] for c in per]),
            )
        if corrections is None:
            t_new, e_new, ll = step((t, e), arrays)
        else:
            t_new, e_new, ll = step(
                (t, e), arrays, corrections=corrections
            )
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
