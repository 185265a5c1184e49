"""Megabase windowed-EM smoke on the real chip -> EM_WINDOW_HW.json.

The round-5 done-criterion for analytic-flank EM windowing (VERDICT r4
#1): EM on a megabase chained-global SAM must run in bounded memory on
hardware — every lattice is the read's aligned window (~2L + 2 pad
diagonals), never the 1 Mb reference, and the flank D-dwell mass enters
through the closed-form corridor correction (align.flank).  Records the
wall time per iteration, the windowed lattice sizes, and the corridor
correction magnitude.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/em_window_smoke.py
  EMW_READS=16 EMW_L=5000 EMW_REFLEN=1000000 EMW_ITERS=3 (defaults)
"""

import json
import os
import sys
import time

import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    n_reads = int(os.environ.get("EMW_READS", "16"))
    L = int(os.environ.get("EMW_L", "5000"))
    ref_len = int(os.environ.get("EMW_REFLEN", "1000000"))
    iters = int(os.environ.get("EMW_ITERS", "3"))
    W = int(os.environ.get("EMW_W", "32"))
    pad = int(os.environ.get("EMW_PAD", "256"))
    rng = np.random.default_rng(0)

    from nanopore_tpu.align.em import EmOptions, em_train
    from nanopore_tpu.align.realign import window_global_pair
    from nanopore_tpu.io.sam import CIG

    print("devices:", jax.devices(), flush=True)
    x = rng.integers(0, 4, ref_len).astype(np.int8)
    pairs = []
    k_windowed = []
    for r in range(n_reads):
        start = int(rng.integers(0, ref_len - L))
        xs = x[start : start + L]
        keep = rng.random(L) > 0.05
        y = xs[keep]
        sub = rng.random(len(y)) < 0.1
        y = np.where(sub, rng.integers(0, 4, len(y)), y).astype(np.int8)
        used = min(len(y), L)
        guide = [(CIG.D, start), (CIG.M, used),
                 (CIG.D, ref_len - start - used)]
        pairs.append((x, y[:used], guide))
        xw, gw, g0, g1 = window_global_pair(x, guide, pad=pad)
        k_windowed.append(len(xw) + used)

    t0 = time.time()
    res = em_train(
        pairs,
        EmOptions(
            trials=1, iterations=iters, band_width=W,
            window_pad=pad, use_mesh=False, batch_size=n_reads,
            convergence_tol=0.0,
        ),
    )
    wall = time.time() - t0
    trace = res.running_likelihoods[0]
    out = {
        "device": str(jax.devices()[0]),
        "date": time.strftime("%Y-%m-%d"),
        "reads": n_reads,
        "read_length": L,
        "ref_length": ref_len,
        "band_width": W,
        "window_pad": pad,
        "iterations_run": len(trace),
        "seconds_total": round(wall, 1),
        "seconds_per_iteration": round(wall / max(len(trace), 1), 2),
        "k_windowed_max": int(max(k_windowed)),
        "k_full_would_be": int(ref_len + L),
        "lattice_shrink_factor": round(
            (ref_len + L) / max(k_windowed), 1
        ),
        "loglik_trace": [round(v, 1) for v in trace],
        "improving": bool(len(trace) < 2 or trace[-1] > trace[0]),
        "rows_normalised": bool(
            np.allclose(res.model.transitions.sum(1), 1.0, atol=1e-6)
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "EM_WINDOW_HW.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1), flush=True)
    print("wrote", path, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
