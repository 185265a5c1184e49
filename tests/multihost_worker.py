"""Worker process for the multi-host end-to-end test.

Launched by tests/test_multihost.py: N of these processes form a
jax.distributed cluster over localhost (CPU devices standing in for
per-host TPU chips), build a global (dp, trial) mesh spanning both
processes, and run one sharded Baum-Welch EM step.  The expectation
psums therefore cross the process boundary — the DCN path of the real
deployment (SURVEY.md section 2.4).

Usage: python multihost_worker.py <proc_id> <nprocs> <port> <out_json>
"""

import json
import sys


def main() -> int:
    proc_id, nprocs, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    import numpy as np
    import jax

    jax.distributed.initialize(
        coordinator_address="localhost:%s" % port,
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs
    local = jax.local_device_count()
    total = jax.device_count()
    assert total == local * nprocs

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from nanopore_tpu.align.model import PairHmmModel
    from nanopore_tpu.io.sam import CIG
    from nanopore_tpu.ops.pairhmm import prepare_banded_batch
    from nanopore_tpu.parallel.mesh import DP_AXIS, TRIAL_AXIS
    from nanopore_tpu.parallel.sharded_em import em_train_step

    # global mesh: dp spans ALL devices of BOTH processes, so the
    # expectation reductions must ride the inter-process channel
    dp, trial = total // 2, 2
    mesh = Mesh(np.array(jax.devices()).reshape(dp, trial),
                (DP_AXIS, TRIAL_AXIS))

    # deterministic global problem, identical in every process
    rng = np.random.default_rng(0)
    B, L, W = dp * 2, 12, 8
    pairs = []
    for _ in range(B):
        x = rng.integers(0, 4, L).astype(np.int8)
        y = x.copy()
        y[3] = (y[3] + 1) % 4
        pairs.append((x, y, [(CIG.M, L)]))
    batch = prepare_banded_batch(pairs, band_width=W)

    model = PairHmmModel.default()
    t0 = np.stack([model.transitions.astype(np.float32)] * trial)
    e0 = np.stack([model.emissions.astype(np.float32)] * trial)
    # make trial models distinct so per-trial logliks differ
    e0[1] = 0.8 * e0[1] + 0.2 / 16.0

    dp_sh = NamedSharding(mesh, P(DP_AXIS))
    tr_sh = NamedSharding(mesh, P(TRIAL_AXIS))

    def globalize(arr, sharding):
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    args = [
        globalize(np.asarray(a), dp_sh)
        for a in (batch.xc, batch.yc, batch.xn, batch.yn, batch.offsets,
                  batch.m, batch.n, batch.k_end)
    ]
    weights = globalize(np.ones(B, np.float32), dp_sh)
    tg = globalize(t0, tr_sh)
    eg = globalize(e0, tr_sh)

    new_t, new_e, loglik = em_train_step(
        tg, eg, *args, weights, band_width=W
    )

    from jax.experimental import multihost_utils

    # global (non-fully-addressable) arrays gather with tiled=True: the
    # result is the fully-replicated global value, shape preserved
    loglik_vec = np.asarray(
        multihost_utils.process_allgather(loglik, tiled=True)
    ).reshape(-1)[:2]
    new_t_full = np.asarray(
        multihost_utils.process_allgather(new_t, tiled=True)
    ).reshape((2, 5, 5))

    with open(out_path, "w") as fh:
        json.dump(
            {
                "process": proc_id,
                "devices_local": local,
                "devices_global": total,
                "loglik": [float(v) for v in loglik_vec],
                "trans_row0": [float(v) for v in new_t_full[0, 0]],
            },
            fh,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
