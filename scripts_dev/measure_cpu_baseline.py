"""Measure the single-core CPU baseline for bench.py's vs_baseline.

Runs the native C++ fused realign (runtime/native/pairhmm_cpu.cpp) on
the EXACT bench.py workload (noisy 5 kb reads, band width 64,
k_max = 2 L) on one core of this box and writes the measured
cells/s to BASELINE_MEASURED.json at the repo root, replacing the
round-1 2e7 estimate with a number measured on this machine.

Usage:  python scripts_dev/measure_cpu_baseline.py  (no TPU needed)
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from nanopore_tpu.align.model import PairHmmModel
    from nanopore_tpu.io.sam import CIG
    from nanopore_tpu.ops.pairhmm import (
        make_kernel_params,
        prepare_banded_batch,
    )
    from nanopore_tpu.runtime.native_pairhmm import cpu_realign_batch

    B = int(os.environ.get("BASELINE_B", "16"))
    L, W = 5_000, 64
    rng = np.random.default_rng(0)
    model = PairHmmModel.load(
        os.path.join(REPO, "nanopore_tpu/models/blasr_hmm_0.txt")
    )
    params = make_kernel_params(model)

    def noisy_pair(n):  # identical generator to bench.py
        x = rng.integers(0, 4, n).astype(np.int8)
        keep = rng.random(n) > 0.05
        y = x[keep]
        sub = rng.random(len(y)) < 0.1
        y = np.where(sub, rng.integers(0, 4, len(y)), y).astype(np.int8)
        d = min(len(y), n)
        guide = [(CIG.M, d)]
        if n > d:
            guide.append((CIG.D, n - d))
        return x, y, guide

    batch = prepare_banded_batch(
        [noisy_pair(L) for _ in range(B)], band_width=W, k_max=2 * L
    )
    out = cpu_realign_batch(batch, params)  # warm (build + touch pages)
    assert out is not None, "native baseline failed to build"
    reps = 3

    def best_time(**kw):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            cpu_realign_batch(batch, params, **kw)
            times.append(time.perf_counter() - t0)
        return min(times)

    best = best_time()
    # decode-only twin (emit_em=False): what cactus_realign itself
    # computes per read (utils.py:587) — baseline for the TPU kernels'
    # emit_em=False mapping/realign decode numbers
    best_decode = best_time(emit_em=False)
    k_total = int(np.asarray(batch.k_end).sum())
    cells = k_total * W
    cells_per_sec = cells / best
    result = {
        "metric": "pairhmm_realign_band_cells_per_sec",
        "cells_per_sec": round(cells_per_sec, 1),
        "reads_per_sec": round(B / best, 3),
        "batch": B,
        "read_length": L,
        "band_width": W,
        "seconds_per_batch": round(best, 4),
        "decode_cells_per_sec": round(cells / best_decode, 1),
        "decode_reads_per_sec": round(B / best_decode, 3),
        "implementation": "single-core C++ fused realign "
        "(nanopore_tpu/runtime/native/pairhmm_cpu.cpp, "
        "-O3 -march=native -ffast-math)",
        "host": os.uname().nodename,
        "cpu_count": os.cpu_count(),
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
