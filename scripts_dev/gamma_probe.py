"""Three-way gamma_match comparison to localise the HW mismatch.

PARITY_HW round-3 found |gamma_pallas - gamma_xla| up to ~170 on HW at
K=10000 while the EM sums over the SAME gammas agree to 2e-5 — so one
of the two gamma BANDS is corrupted in places the EM sums don't see,
or one backend drifts on hardware only.  This probe computes the same
8-read batch's gamma band three ways:

  stage cpu:   XLA forward_backward on CPU  -> /tmp/gamma_cpu.npy
  stage tpu:   XLA forward_backward on TPU and the Pallas emit_gamma
               band, compared against each other AND the CPU reference.

Run:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts_dev/gamma_probe.py cpu
  PYTHONPATH=...:.axon_site python scripts_dev/gamma_probe.py tpu
"""

import os
import sys

# this probe EXISTS to exercise the known-bad TPU gamma path; production
# code refuses it (ops.dispatch.require_gamma_safe_backend)
os.environ.setdefault("NANOPORE_TPU_ALLOW_TPU_GAMMA", "1")

import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nanopore_tpu.align.model import PairHmmModel  # noqa: E402
from nanopore_tpu.io.sam import CIG  # noqa: E402
from nanopore_tpu.ops.pairhmm import (  # noqa: E402
    forward_backward,
    make_kernel_params,
    prepare_banded_batch,
)

B, L, W = 8, 5000, 64
OUT = "/tmp/gamma_cpu.npy"


def build():
    rng = np.random.default_rng(0)  # same pairs as hw_parity.py
    model = PairHmmModel.load("nanopore_tpu/models/blasr_hmm_0.txt")
    params = make_kernel_params(model)
    pairs = []
    for _ in range(B):
        x = rng.integers(0, 4, L).astype(np.int8)
        y = x.copy()
        idx = rng.integers(0, L, L // 10)
        y[idx] = (y[idx] + 1) % 4
        pairs.append((x, y, [(CIG.M, L)]))
    return pairs, params


def report(name, got, want, offsets):
    K1 = min(got.shape[1], want.shape[1])
    ks = np.arange(K1)[:, None]
    worst = 0.0
    for b in range(B):
        j = offsets[b][:K1, None] + np.arange(W)[None, :]
        i = ks - j
        valid = (i >= 1) & (i <= L) & (j >= 1) & (j <= L)
        diff = np.where(valid, np.abs(got[b][:K1] - want[b][:K1]), 0.0)
        worst = max(worst, float(diff.max()))
        bad = diff > 1e-2
        if bad.any():
            kk, ww = np.nonzero(bad)
            amax = np.unravel_index(np.argmax(diff), diff.shape)
            print(
                "  %s read %d: %d bad; k [%d,%d] kmod16 %s w [%d,%d]; "
                "argmax k=%d w=%d got=%.4g want=%.4g"
                % (name, b, bad.sum(), kk.min(), kk.max(),
                   sorted(set((kk % 16).tolist()))[:6], ww.min(),
                   ww.max(), amax[0], amax[1], got[b][amax],
                   want[b][amax]),
                flush=True,
            )
    print("%s: max abs err %.4g" % (name, worst), flush=True)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    pairs, params = build()
    batch = prepare_banded_batch(pairs, band_width=W, k_max=2 * L)
    offsets = np.asarray(batch.offsets)
    print("devices:", jax.devices(), "stage:", stage, flush=True)

    fb = forward_backward(batch, params)
    gm_fb = np.asarray(fb["gamma_match"])
    if stage == "cpu":
        np.save(OUT, gm_fb)
        print("saved", OUT, gm_fb.shape, flush=True)
        return 0

    gm_cpu = np.load(OUT)
    report("fb_tpu vs fb_cpu", gm_fb, gm_cpu, offsets)

    from nanopore_tpu.ops.pairhmm_pallas_realign import PallasRealignPlan

    host = prepare_banded_batch(
        pairs, band_width=W, k_max=2 * L, device=False
    )
    from nanopore_tpu.ops.pairhmm_pallas_realign import (
        gamma_band_from_raw,
    )

    plan = PallasRealignPlan(
        host, params, emit_gamma=True, emit_em=False
    )
    gm_p = gamma_band_from_raw(plan.run()["gamma_raw"], B, 2 * L)
    report("pallas vs fb_cpu", gm_p, gm_cpu, offsets)
    report("pallas vs fb_tpu", gm_p, gm_fb, offsets)
    return 0


if __name__ == "__main__":
    sys.exit(main())
