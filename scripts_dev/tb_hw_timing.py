"""On-chip traceback walker vs the XLA scan: correctness + timing on HW.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/tb_hw_timing.py
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
from nanopore_tpu.ops.mea import traceback_cigars_raw  # noqa: E402
from nanopore_tpu.ops.pairhmm_pallas_realign import (  # noqa: E402
    PallasRealignPlan,
)
from nanopore_tpu.ops.traceback_pallas import (  # noqa: E402
    traceback_cigars_pallas,
)


def main():
    B = int(os.environ.get("TB_B", "128"))
    L = int(os.environ.get("TB_L", "5000"))
    W = 64
    print("devices:", jax.devices(), "B=%d L=%d" % (B, L), flush=True)
    rng = np.random.default_rng(0)
    model = PairHmmModel.load("nanopore_tpu/models/blasr_hmm_0.txt")
    params = make_kernel_params(model)
    pairs = []
    for _ in range(B):
        x = rng.integers(0, 4, L).astype(np.int8)
        keep = rng.random(L) > 0.05
        y = x[keep]
        sub = rng.random(len(y)) < 0.1
        y = np.where(sub, rng.integers(0, 4, len(y)), y).astype(np.int8)
        d = min(len(y), L)
        guide = [(CIG.M, d)]
        if L > d:
            guide.append((CIG.D, L - d))
        pairs.append((x, y, guide))
    batch = prepare_banded_batch(
        pairs, band_width=W, k_max=2 * L, device=False
    )
    plan = PallasRealignPlan(batch, params, emit_em=False)
    out = plan.run()
    offsets = np.asarray(batch.offsets)
    ms, ns = np.asarray(batch.m), np.asarray(batch.n)

    t0 = time.time()
    got = traceback_cigars_pallas(out["dirs_raw"], offsets, ms, ns)
    print("pallas walker compile+first %.1fs" % (time.time() - t0),
          flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        got = traceback_cigars_pallas(out["dirs_raw"], offsets, ms, ns)
        times.append(time.time() - t0)
    print("pallas walker: %.3f s/batch (%.0f reads/s)"
          % (min(times), B / min(times)), flush=True)

    t0 = time.time()
    want = traceback_cigars_raw(out["dirs_raw"], offsets, ms, ns)
    print("xla scan compile+first %.1fs" % (time.time() - t0), flush=True)
    t0 = time.time()
    want = traceback_cigars_raw(out["dirs_raw"], offsets, ms, ns)
    print("xla scan: %.3f s/batch" % (time.time() - t0), flush=True)

    same = sum(int(got[b] == want[b]) for b in range(B))
    print("cigars identical: %d/%d" % (same, B), flush=True)
    return 0 if same == B else 1


if __name__ == "__main__":
    sys.exit(main())
