"""HW validation of the on-device packer (ops.pack_pallas).

Checks, on the real chip, that the packer kernel's xyc output is
byte-identical to the round-3 host pack (sampled row slices — the full
84 MB band never crosses the tunnel), and that the realign decode fed
by the packer produces identical logliks/cigars to the host-pack
route.  Also times the host-side stream pack vs the old host pack and
the packer kernel itself.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/pack_probe.py
  PACK_B=128 PACK_L=5000 (defaults)

Writes PACK_HW.json at the repo root.
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
from nanopore_tpu.ops.pairhmm import make_kernel_params  # noqa: E402
from nanopore_tpu.ops.pairhmm_pallas_realign import (  # noqa: E402
    PallasRealignPlan,
    pack_pallas_pairs,
)
from nanopore_tpu.ops.pack_pallas import (  # noqa: E402
    materialize_xyc,
    pack_stream_pairs,
)
from nanopore_tpu.ops.traceback_pallas import (  # noqa: E402
    traceback_cigars_pallas,
)


def main():
    B = int(os.environ.get("PACK_B", "128"))
    L = int(os.environ.get("PACK_L", "5000"))
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

    t0 = time.time()
    host = pack_pallas_pairs(pairs, params, W, k_max=2 * L)
    t_host = time.time() - t0
    t0 = time.time()
    prep = pack_stream_pairs(pairs, params, W, k_max=2 * L)
    t_stream = time.time() - t0
    stream_bytes = (
        prep["stream"].nbytes + prep["initx"].nbytes + prep["mn"].nbytes
    )
    t0 = time.time()
    prep = materialize_xyc(prep)
    float(np.asarray(prep["xyc"][0, 0, 0, 0]))  # force completion
    t_kernel_cold = time.time() - t0
    print(
        "host pack %.2fs | stream pack %.2fs (%.2f MB up) | "
        "packer kernel cold (incl compile+upload) %.1fs"
        % (t_host, t_stream, stream_bytes / 1e6, t_kernel_cold),
        flush=True,
    )

    # byte identity on sampled row slices (full pull would be 84 MB)
    k_pad = prep["k_pad"]
    slices = [(0, 64), (k_pad // 2 - 32, 64), (k_pad - 64, 64)]
    ident = True
    for s0, sl in slices:
        got = np.asarray(prep["xyc"][:, s0 : s0 + sl])
        want = host["xyc"][:, s0 : s0 + sl]
        ok = bool((got == want).all())
        ident = ident and ok
        print("rows %d..%d identical: %s" % (s0, s0 + sl, ok), flush=True)

    # end-to-end: decode through BOTH packs must agree exactly
    plan_s = PallasRealignPlan(None, params, emit_em=False, prep=prep)
    plan_h = PallasRealignPlan(None, params, emit_em=False, prep=host)
    out_s = plan_s.run()
    out_h = plan_h.run()
    ll_s = np.asarray(out_s["loglik"])
    ll_h = np.asarray(out_h["loglik"])
    ll_ok = bool((ll_s == ll_h).all())
    offs = prep["offsets"]
    cig_s = traceback_cigars_pallas(
        out_s["dirs_raw"], offs, prep["m"], prep["n"]
    )
    cig_h = traceback_cigars_pallas(
        out_h["dirs_raw"], offs, prep["m"], prep["n"]
    )
    cig_ok = all(a == b for a, b in zip(cig_s, cig_h))
    print("loglik bit-identical: %s | cigars identical: %s"
          % (ll_ok, cig_ok), flush=True)

    # warm packer timing (upload + kernel, pipelined as production runs)
    t0 = time.time()
    p2 = pack_stream_pairs(pairs, params, W, k_max=2 * L)
    p2 = materialize_xyc(p2)
    float(np.asarray(p2["xyc"][0, 0, 0, 0]))
    t_warm = time.time() - t0
    print("stream pack + upload + packer warm: %.2fs" % t_warm, flush=True)

    out = {
        "B": B,
        "read_length": L,
        "slice_identity": ident,
        "loglik_identical": ll_ok,
        "cigars_identical": cig_ok,
        "pass": bool(ident and ll_ok and cig_ok),
        "host_pack_seconds": round(t_host, 2),
        "stream_pack_seconds": round(t_stream, 2),
        "stream_upload_mb": round(stream_bytes / 1e6, 2),
        "packed_mb": round(host["xyc"].nbytes / 1e6, 2),
        "stream_pack_upload_kernel_warm_seconds": round(t_warm, 2),
        "date": time.strftime("%Y-%m-%d"),
        "device": str(jax.devices()[0]),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PACK_HW.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path, json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
