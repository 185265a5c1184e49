"""Hardware timing: Pallas fused forward vs XLA-scan forward.

Run on the real TPU (axon). One process at a time; compiles are slow
(~10 min cold) so the persistent cache is enabled.
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
from nanopore_tpu.ops.pairhmm_pallas import pallas_forward_loglik  # noqa: E402


def main():
    B, L, W = 128, 5_000, 64
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    model = PairHmmModel.load("nanopore_tpu/models/blasr_hmm_0.txt")
    params = make_kernel_params(model)

    # uniform geometry: same length, same straight guide for all reads
    pairs = []
    for _ in range(B):
        x = rng.integers(0, 4, L).astype(np.int8)
        y = x.copy()
        idx = rng.integers(0, L, L // 10)
        y[idx] = (y[idx] + 1) % 4
        pairs.append((x, y, [(CIG.M, L)]))
    batch = prepare_banded_batch(pairs, band_width=W, k_max=2 * L)
    K = batch.k_max
    cells = B * K * W

    def run_pallas():
        return np.asarray(pallas_forward_loglik(batch, params))

    def run_xla():
        return np.asarray(forward_loglik(batch, params))

    for name, fn in (("pallas_fwd", run_pallas), ("xla_fwd", run_xla)):
        t0 = time.time()
        first = fn()
        t_compile = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            out = fn()
            times.append(time.time() - t0)
        best = min(times)
        print(
            "%s: first(+compile) %.1fs, best %.4fs, %.3f Gcells/s, "
            "%.1f ns/step, loglik[0]=%.3f"
            % (name, t_compile, best, cells / best / 1e9,
               best / K * 1e9, float(first[0])),
            flush=True,
        )
        if name == "pallas_fwd":
            pallas_out = first
        else:
            xla_out = first
    err = np.max(np.abs(pallas_out - xla_out) / np.maximum(np.abs(xla_out), 1))
    print("max rel diff pallas vs xla: %.2e" % err, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
