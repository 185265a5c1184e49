"""Bisect the fused Pallas realign phase-B hardware miscompile.

Round-1 finding (PARITY.md): on real v5e the fused kernel's loglik
(phase A) is correct but score/trans (phase B) are wrong; interpret mode
passes.  This ladder runs the SAME kernel at shrinking structural
configurations (segments, chunks, slot alternation, dirs-DMA waits) on
hardware and in interpret mode, saving outputs for diffing — the first
config that diverges localises the miscompiling construct.

Usage:
  # on TPU (axon default platform):
  BIS_CONFIGS=A,B,C,D python scripts_dev/pallas_bisect.py
  # interpret oracle on CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu BIS_INTERPRET=1 \
      BIS_CONFIGS=A,B,C,D python scripts_dev/pallas_bisect.py
  # compare:
  python scripts_dev/pallas_bisect.py compare A B C D
"""

import os
import sys
import time

import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")

# Each row: distinct k (=> distinct jit cache key; CHUNK/SEG are module
# globals not in the key, so one process must never repeat a k).
CONFIGS = {
    # S=2, minimal segments, no si>=2 dirs-wait path, 1 phase-A chunk
    "A": dict(L=8, k=16, chunk=16, seg=8),
    # S=8: full slot ping-pong + si>=2 dirs waits; 4 phase-A chunks
    "B": dict(L=32, k=64, chunk=16, seg=8),
    # production SEG=32 body, S=3
    "C": dict(L=48, k=96, chunk=32, seg=32),
    # production constants CHUNK=128/SEG=32, S=8
    "D": dict(L=128, k=256, chunk=128, seg=32),
    # bigger lattice, prod constants, S=32
    "E": dict(L=512, k=1024, chunk=128, seg=32),
}
OUT_DIR = "/tmp/pallas_bisect"


def make_batch(cfg):
    from nanopore_tpu.io.sam import CIG
    from nanopore_tpu.ops.pairhmm import prepare_banded_batch

    rng = np.random.default_rng(0)
    L = cfg["L"]
    pairs = []
    for _ in range(128):
        x = rng.integers(0, 4, L).astype(np.int8)
        y = x.copy()
        idx = rng.integers(0, L, max(1, L // 10))
        y[idx] = (y[idx] + 1) % 4
        pairs.append((x, y, [(CIG.M, L)]))
    batch = prepare_banded_batch(pairs, band_width=64, k_max=cfg["k"])
    return batch


def run_cfg(name, cfg, interpret, params):
    import nanopore_tpu.ops.pairhmm_pallas_realign as ppr

    ppr.CHUNK, ppr.SEG = cfg["chunk"], cfg["seg"]
    batch = make_batch(cfg)
    plan = ppr.PallasRealignPlan(batch, params)
    t0 = time.time()
    out = plan.run(interpret=interpret)
    res = {k: np.asarray(v) for k, v in out.items()}
    print("%s: run %.1fs  loglik[0]=%.4f score[0]=%.4f" % (
        name, time.time() - t0, res["loglik"][0], res["score"][0]),
        flush=True)
    return res


def compare(names):
    for name in names:
        try:
            hw = np.load(os.path.join(OUT_DIR, "bisect_%s_hw.npz" % name))
            it = np.load(os.path.join(OUT_DIR, "bisect_%s_int.npz" % name))
        except FileNotFoundError as e:
            print("%s: missing (%s)" % (name, e))
            continue
        print("== config %s ==" % name)
        for key in hw.files:
            a, b = hw[key], it[key]
            if a.dtype == np.int8:
                n_diff = int((a != b).sum())
                print("  %-8s int8 mismatches: %d / %d" % (
                    key, n_diff, a.size))
            else:
                denom = np.maximum(np.abs(b), 1e-3)
                rel = np.abs(a - b) / denom
                print("  %-8s max rel diff %.3e  (argmax %s)" % (
                    key, rel.max(),
                    np.unravel_index(rel.argmax(), rel.shape)))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "compare":
        compare(sys.argv[2:] or list(CONFIGS))
        return 0

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nanopore_tpu.align.model import PairHmmModel
    from nanopore_tpu.ops.pairhmm import make_kernel_params

    interpret = os.environ.get("BIS_INTERPRET") == "1"
    tag = "int" if interpret else "hw"
    if not interpret:
        print("devices:", jax.devices(), flush=True)
    os.makedirs(OUT_DIR, exist_ok=True)
    model = PairHmmModel.load("nanopore_tpu/models/blasr_hmm_0.txt")
    params = make_kernel_params(model)
    which = os.environ.get("BIS_CONFIGS", "A,B,C,D").split(",")
    for name in which:
        res = run_cfg(name, CONFIGS[name], interpret, params)
        np.savez(
            os.path.join(OUT_DIR, "bisect_%s_%s.npz" % (name, tag)), **res
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
