"""Are the pallas-vs-XLA dirs mismatches harmless argmax ties?

Tracebacks both dirs tensors; a real miscompile breaks the cigar
invariants (consumed m/n) or tanks alignment identity, a tie flip
produces an equally-scoring alternative path.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/dirs_probe.py
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


def cig_sums(cig):
    m = sum(l for op, l in cig if op in (CIG.M, CIG.I))
    n = sum(l for op, l in cig if op in (CIG.M, CIG.D))
    return m, n


def identity(cig, x, y):
    """Matched-base identity of a global cigar over codes x (ref), y."""
    i = j = match = aligned = 0
    for op, l in cig:
        if op == CIG.M:
            match += int((x[j:j + l] == y[i:i + l]).sum())
            aligned += l
            i += l
            j += l
        elif op == CIG.I:
            i += l
        else:
            j += l
    return match / max(aligned, 1)


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
    offsets = np.asarray(batch.offsets)

    t0 = time.time()
    x_out = realign_fused(batch, params)
    x_dirs = np.asarray(x_out["dirs"])
    print("xla %.0fs" % (time.time() - t0), flush=True)

    from nanopore_tpu.ops.pairhmm_pallas_realign import PallasRealignPlan

    t0 = time.time()
    plan = PallasRealignPlan(batch, params)
    p_out = plan.run()
    from nanopore_tpu.ops.pairhmm_pallas_realign import (
        dirs_band_from_raw,
    )

    p_dirs = dirs_band_from_raw(p_out["dirs_raw"], B, 2 * L)[
        :, : offsets.shape[1]
    ]
    print("pallas %.0fs" % (time.time() - t0), flush=True)

    mism = p_dirs != x_dirs
    print("total dirs mismatches:", int(mism.sum()), flush=True)
    # where do they live? diag index range + band position range
    ks, ws = np.nonzero(mism.any(axis=0) if mism.ndim == 3 else mism)
    if len(ks):
        print("diag range: %d..%d of %d; band pos range %d..%d"
              % (ks.min(), ks.max(), offsets.shape[1], ws.min(), ws.max()),
              flush=True)

    ok = True
    for b, (x, y, _) in enumerate(pairs):
        m, n = len(y), len(x)
        cx = mea_traceback_fwd(x_dirs[b], offsets[b], m, n)
        cp = mea_traceback_fwd(p_dirs[b], offsets[b], m, n)
        sx, sp = cig_sums(cx), cig_sums(cp)
        idx_, idp = identity(cx, x, y), identity(cp, x, y)
        same = cx == cp
        print("read %d: inv xla=%s pallas=%s (want (%d,%d)) "
              "identity xla=%.5f pallas=%.5f same_cigar=%s"
              % (b, sx, sp, m, n, idx_, idp, same), flush=True)
        if sp != (m, n) or abs(idx_ - idp) > 2e-3:
            ok = False
    print("VERDICT:", "ties-harmless" if ok else "REAL-BUG", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
