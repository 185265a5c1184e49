"""Which kernel is wrong at production K? Compare each against the C++
double-log-scale oracle at L=5000 (K=10240).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/accuracy_probe.py
  (TPU run; add JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= for the CPU probe,
   which skips the pallas kernel unless BIS_INTERPRET=1)
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
)
from nanopore_tpu.ops.mea import realign_fused  # noqa: E402
from nanopore_tpu.runtime.native_pairhmm import cpu_realign_batch  # noqa


def rel(a, b):
    a = np.asarray(a, np.float64).reshape(-1)
    b = np.asarray(b, np.float64).reshape(-1)
    return np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-3))


def main():
    B = int(os.environ.get("PROBE_B", "4"))
    L = int(os.environ.get("PROBE_L", "5000"))
    W = 64
    print("devices:", jax.devices(), "B=%d L=%d" % (B, L), flush=True)
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
    batch = prepare_banded_batch(pairs, band_width=W, k_max=2 * L)

    t0 = time.time()
    oracle = cpu_realign_batch(batch, params, 0.5, 0.0)
    print("oracle %.0fs" % (time.time() - t0), flush=True)

    t0 = time.time()
    x_out = realign_fused(batch, params)
    x_out = {k: np.asarray(v) for k, v in x_out.items()}
    print("xla %.0fs" % (time.time() - t0), flush=True)
    for key in ("loglik", "score"):
        print("xla %-7s rel %.3e" % (key, rel(x_out[key], oracle[key])),
              flush=True)
    print("xla trans   rel %.3e" % rel(
        x_out["trans"].reshape(B, 25), oracle["trans"]), flush=True)

    if os.environ.get("PROBE_PALLAS", "1") == "1":
        from nanopore_tpu.ops.pairhmm_pallas_realign import PallasRealignPlan

        t0 = time.time()
        plan = PallasRealignPlan(batch, params)
        p_out = plan.run(
            interpret=os.environ.get("BIS_INTERPRET") == "1"
        )
        p_out = {k: np.asarray(v) for k, v in p_out.items()}
        print("pallas %.0fs" % (time.time() - t0), flush=True)
        for key in ("loglik", "score"):
            print("pallas %-7s rel %.3e"
                  % (key, rel(p_out[key], oracle[key])), flush=True)
        print("pallas trans   rel %.3e" % rel(
            p_out["trans"].reshape(B, 25), oracle["trans"]), flush=True)
        from nanopore_tpu.ops.pairhmm_pallas_realign import (
            dirs_band_from_raw,
        )

        p_dirs = dirs_band_from_raw(p_out["dirs_raw"], B, 2 * L)
        print("dirs mismatches: %d"
              % int((p_dirs[:, : batch.offsets.shape[1]]
                     != np.asarray(x_out["dirs"])).sum()), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
