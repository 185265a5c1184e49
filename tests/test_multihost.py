"""Multi-host end-to-end test: 2 real processes over jax.distributed.

The reference's only multi-node story is batch-system process placement
(parasol/gridEngine, Makefile:2); ours is jax.distributed over DCN.
This test forms an actual 2-process cluster on localhost (CPU devices
standing in for per-host chips), runs one sharded EM step on a mesh
spanning both processes, and checks both agree with each other and with
the single-process result.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def test_two_process_em_step(tmp_path):
    # worker wall clock is bounded by the communicate(timeout=420) below
    port = _free_port()
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=REPO,
    )
    outs = [str(tmp_path / ("w%d.json" % i)) for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), outs[i]],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, "worker failed:\n" + log

    results = []
    for path in outs:
        with open(path) as fh:
            results.append(json.load(fh))

    r0, r1 = results
    assert r0["devices_global"] == r1["devices_global"] == 8
    assert r0["devices_local"] == r1["devices_local"] == 4
    # both processes observed the same global reduction results
    np.testing.assert_allclose(r0["loglik"], r1["loglik"], rtol=1e-6)
    np.testing.assert_allclose(
        r0["trans_row0"], r1["trans_row0"], rtol=1e-6
    )
    assert np.isfinite(r0["loglik"]).all()
    # the two trial models differ, so their logliks must differ
    assert abs(r0["loglik"][0] - r0["loglik"][1]) > 1e-3

    # cross-check against the same step computed single-process on the
    # in-test (8-virtual-device, one-process) runtime
    from nanopore_tpu.align.model import PairHmmModel
    from nanopore_tpu.io.sam import CIG
    from nanopore_tpu.ops.pairhmm import prepare_banded_batch
    from nanopore_tpu.parallel.sharded_em import em_train_step

    rng = np.random.default_rng(0)
    B, L, W = 8, 12, 8
    pairs = []
    for _ in range(B):
        x = rng.integers(0, 4, L).astype(np.int8)
        y = x.copy()
        y[3] = (y[3] + 1) % 4
        pairs.append((x, y, [(CIG.M, L)]))
    batch = prepare_banded_batch(pairs, band_width=W)
    model = PairHmmModel.default()
    t0 = np.stack([model.transitions.astype(np.float32)] * 2)
    e0 = np.stack([model.emissions.astype(np.float32)] * 2)
    e0[1] = 0.8 * e0[1] + 0.2 / 16.0
    _, _, loglik = em_train_step(
        t0, e0, batch.xc, batch.yc, batch.xn, batch.yn, batch.offsets,
        batch.m, batch.n, batch.k_end, np.ones(B, np.float32),
        band_width=W,
    )
    np.testing.assert_allclose(
        r0["loglik"], np.asarray(loglik), rtol=1e-5
    )
