"""HW parity + timing of the kernel-fused expectation retire (emit_exp).

Round-4 structural change: the SNP posterior expectation accumulator
(reference marginAlignSnpCaller.py:149-155) moved INSIDE realign phase
B.  This probe validates it ON HARDWARE against the round-3-validated
gamma route (Pallas emit_gamma stream + XLA raw retire scan, which was
oracle-matched in PARITY_HW r3), then times both routes end to end
(kernel + device reductions + host pulls + scatter).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/exp_probe.py
  EXP_B=128 EXP_L=5000 (defaults)

Writes EXP_HW.json at the repo root.
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

from nanopore_tpu.align.model import PairHmmModel  # noqa: E402
from nanopore_tpu.io.sam import CIG  # noqa: E402
from nanopore_tpu.ops.pairhmm import (  # noqa: E402
    make_kernel_params,
    prepare_banded_batch,
)
from nanopore_tpu.ops.pairhmm_pallas_realign import (  # noqa: E402
    PallasRealignPlan,
)
from nanopore_tpu.ops.posteriors import (  # noqa: E402
    posterior_expectations_fused,
    posterior_expectations_raw,
)

THRESHOLD = 0.01  # POSTERIOR_THRESHOLD of the SNP caller


def main():
    B = int(os.environ.get("EXP_B", "128"))
    L = int(os.environ.get("EXP_L", "5000"))
    W = 64
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)
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
    offsets = np.asarray(batch.offsets)
    ns = np.asarray(batch.n)

    # route A (round-3 validated): gamma stream + raw retire scan
    plan_g = PallasRealignPlan(
        batch, params, emit_gamma=True, emit_em=False
    )
    # route B (round-4 fused): in-kernel retire stream
    plan_e = PallasRealignPlan(
        batch, params, emit_em=False, emit_exp=True,
        exp_threshold=THRESHOLD,
    )

    def run_gamma():
        out = plan_g.run()
        return posterior_expectations_raw(
            out["gamma_raw"], plan_g.yc_raw(), offsets, ns, THRESHOLD
        )

    def run_fused():
        out = plan_e.run()
        return posterior_expectations_fused(
            out["ret_raw"], out["flush_raw"], offsets, ns, W
        )

    t0 = time.time()
    eg = run_gamma()
    t_gamma_cold = time.time() - t0
    print("gamma route cold (incl compile): %.1fs" % t_gamma_cold,
          flush=True)
    t0 = time.time()
    ef = run_fused()
    t_fused_cold = time.time() - t0
    print("fused route cold (incl compile): %.1fs" % t_fused_cold,
          flush=True)

    # parity: fused vs gamma-route expectations
    max_abs = 0.0
    max_rel = 0.0
    for b in range(B):
        d = np.abs(ef[b] - eg[b])
        max_abs = max(max_abs, float(d.max()))
        denom = np.maximum(np.abs(eg[b]), 1e-3)
        max_rel = max(max_rel, float((d / denom).max()))
    print("parity: max_abs=%.3e max_rel=%.3e" % (max_abs, max_rel),
          flush=True)

    t0 = time.time()
    run_gamma()
    t_gamma = time.time() - t0
    t0 = time.time()
    run_fused()
    t_fused = time.time() - t0
    # decode-kernel reference time (emit_em=False, no posterior
    # outputs): the VERDICT done-criterion denominator
    plan_d = PallasRealignPlan(batch, params, emit_em=False)
    float(np.asarray(plan_d.run()["loglik"]).sum())
    t0 = time.time()
    float(np.asarray(plan_d.run()["loglik"]).sum())
    t_decode = time.time() - t0
    print(
        "warm: gamma=%.2fs fused=%.2fs decode-kernel=%.2fs "
        "(fused/decode=%.2fx)"
        % (t_gamma, t_fused, t_decode, t_fused / t_decode),
        flush=True,
    )

    out = {
        "B": B,
        "read_length": L,
        "threshold": THRESHOLD,
        "parity_max_abs": round(max_abs, 6),
        "parity_max_rel": round(max_rel, 6),
        "pass": bool(max_abs < 5e-2 and max_rel < 2e-2),
        "warm_seconds": {
            "gamma_route": round(t_gamma, 3),
            "fused_route": round(t_fused, 3),
            "decode_kernel": round(t_decode, 3),
        },
        "fused_over_decode": round(t_fused / t_decode, 3),
        "date": time.strftime("%Y-%m-%d"),
        "device": str(jax.devices()[0]),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "EXP_HW.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path, json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
