"""Hardware validation of the W=32 band width on the Pallas kernels.

W=32 is one int8 sublane tile; dispatch allows it for presets trading
band slack for 2x fewer cells (the reference production band was 21:
--diagonalExpansion=10).  Checks realign decode + viterbi outputs
against the XLA scans on the chip and times both.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/w32_probe.py
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
from nanopore_tpu.ops.mea import realign_fused, mea_traceback_fwd  # noqa
from nanopore_tpu.ops.pairhmm_pallas_realign import (  # noqa: E402
    PallasRealignPlan,
)


def main():
    B = int(os.environ.get("PROBE_B", "128"))
    L = int(os.environ.get("PROBE_L", "2000"))
    W = 32
    print("devices:", jax.devices(), "B=%d L=%d W=%d" % (B, L, W),
          flush=True)
    rng = np.random.default_rng(0)
    model = PairHmmModel.load("nanopore_tpu/models/blasr_hmm_0.txt")
    params = make_kernel_params(model)
    pairs = []
    for _ in range(B):
        x = rng.integers(0, 4, L).astype(np.int8)
        y = x.copy()
        idx = rng.integers(0, L, L // 12)
        y[idx] = (y[idx] + 1) % 4
        pairs.append((x, y, [(CIG.M, L)]))
    batch = prepare_banded_batch(
        pairs, band_width=W, k_max=2 * L, device=False
    )

    plan = PallasRealignPlan(batch, params, emit_em=False)
    t0 = time.time()
    got = {k: np.asarray(v) for k, v in plan.run().items()}
    print("pallas W=32 compile+run %.0fs" % (time.time() - t0), flush=True)
    from nanopore_tpu.ops.pairhmm_pallas_realign import dirs_band_from_raw

    got_dirs = dirs_band_from_raw(got["dirs_raw"], B, 2 * L)

    want = realign_fused(batch, params)
    ll_w = np.asarray(want["loglik"])
    rel = np.max(np.abs(got["loglik"] - ll_w) / np.maximum(np.abs(ll_w), 1))
    print("loglik rel err vs XLA: %.3e" % rel, flush=True)

    offsets = np.asarray(batch.offsets)
    same = 0
    for b in range(min(B, 16)):
        m, n = len(pairs[b][1]), len(pairs[b][0])
        cg = mea_traceback_fwd(got_dirs[b], offsets[b], m, n)
        cw = mea_traceback_fwd(np.asarray(want["dirs"])[b], offsets[b], m, n)
        same += int(cg == cw)
    print("cigars identical: %d/16" % same, flush=True)

    times = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(plan.run()["ll_score"])
        times.append(time.time() - t0)
    cells = int(np.asarray(batch.k_end).sum()) * W
    print(
        "W=32 decode: %.4f s/batch = %.2f Gcells/s"
        % (min(times), cells / min(times) / 1e9),
        flush=True,
    )
    return 0 if (rel < 1e-3 and same == min(B, 16)) else 1


if __name__ == "__main__":
    sys.exit(main())
