"""Hardware timing: Pallas fused kernels vs the XLA-scan kernels.

Run on the real TPU (axon), one process at a time.  Host repack costs
seconds for these batch sizes, so each path builds its plan/batch ONCE
and only the device call is timed (matching how production drivers use
the kernels).
"""

import os
import sys
import time

import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nanopore_tpu.align.model import PairHmmModel  # noqa: E402
from nanopore_tpu.io.sam import CIG  # noqa: E402
from nanopore_tpu.ops.pairhmm import (  # noqa: E402
    make_kernel_params,
    prepare_banded_batch,
    forward_loglik,
)
from nanopore_tpu.ops.mea import realign_fused  # noqa: E402
from nanopore_tpu.ops.pairhmm_pallas import PallasForwardPlan  # noqa: E402
from nanopore_tpu.ops.pairhmm_pallas_realign import (  # noqa: E402
    PallasRealignPlan,
)


def bench(name, fn, cells, K):
    t0 = time.time()
    first = fn()
    t_compile = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    best = min(times)
    print(
        "%-16s first(+compile) %6.1fs  best %8.4fs  %7.3f Gcells/s  "
        "%8.1f ns/diag" % (name, t_compile, best, cells / best / 1e9,
                           best / K * 1e9),
        flush=True,
    )
    return first, best


def main():
    B = int(os.environ.get("TIMING_B", "128"))
    L, W = 5_000, 64
    print("devices:", jax.devices(), "B=%d" % B, flush=True)
    rng = np.random.default_rng(0)
    model = PairHmmModel.load("nanopore_tpu/models/blasr_hmm_0.txt")
    params = make_kernel_params(model)

    pairs = []
    for _ in range(B):
        x = rng.integers(0, 4, L).astype(np.int8)
        y = x.copy()
        idx = rng.integers(0, L, L // 10)
        y[idx] = (y[idx] + 1) % 4
        pairs.append((x, y, [(CIG.M, L)]))
    t0 = time.time()
    batch = prepare_banded_batch(pairs, band_width=W, k_max=2 * L)
    print("prepare_banded_batch %.1fs" % (time.time() - t0), flush=True)
    K = batch.k_max
    cells = B * K * W

    t0 = time.time()
    fplan = PallasForwardPlan(batch, params)
    print("PallasForwardPlan %.1fs" % (time.time() - t0), flush=True)
    pallas_fwd, _ = bench(
        "pallas_fwd", lambda: np.asarray(fplan.run()), cells, K
    )
    xla_fwd, _ = bench(
        "xla_fwd", lambda: np.asarray(forward_loglik(batch, params)),
        cells, K,
    )
    err = np.max(np.abs(pallas_fwd - xla_fwd) / np.maximum(np.abs(xla_fwd), 1))
    print("fwd max rel diff: %.2e" % err, flush=True)

    t0 = time.time()
    rplan = PallasRealignPlan(batch, params)
    print("PallasRealignPlan %.1fs" % (time.time() - t0), flush=True)

    def run_pallas_realign():
        out = rplan.run()
        return (np.asarray(out["loglik"]), np.asarray(out["score"]),
                np.asarray(out["trans"]))

    p_re, _ = bench("pallas_realign", run_pallas_realign, cells, K)

    def run_xla_realign():
        out = realign_fused(batch, params)
        return (np.asarray(out["loglik"]), np.asarray(out["score"]),
                np.asarray(out["trans"]))

    x_re, _ = bench("xla_realign", run_xla_realign, cells, K)
    for nm, a, b in zip(("loglik", "score", "trans"), p_re, x_re):
        err = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-3))
        print("realign %s max rel diff: %.2e" % (nm, err), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
