"""Stage breakdown of the Viterbi decode path on HW (dev tooling).

Times each stage of PreparedViterbi.decode separately so walker
optimisation targets the real cost, not a guess.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/vit_stage_probe.py
"""

import os
import sys
import time

import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nanopore_tpu.align.model import PairHmmModel  # noqa: E402
from nanopore_tpu.io.sam import CIG  # noqa: E402
from nanopore_tpu.ops.pairhmm import (  # noqa: E402
    make_kernel_params,
    prepare_banded_batch,
)
from nanopore_tpu.ops.pairhmm_pallas_viterbi import (  # noqa: E402
    PallasViterbiPlan,
)
import nanopore_tpu.ops.traceback_pallas as tbp  # noqa: E402


def main():
    B = int(os.environ.get("VITERBI_B", "1024"))
    L = 5000
    W = 64
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), "B=%d" % B, flush=True)
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
    plan = PallasViterbiPlan(batch, params)
    offsets = np.asarray(batch.offsets)
    m = np.asarray(batch.m)
    n = np.asarray(batch.n)

    def t(label, fn, reps=2):
        fn()
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            r = fn()
            best = min(best, time.time() - t0)
        print("%-28s %.4fs" % (label, best), flush=True)
        return r

    out = t("fwd kernel (async+ll pull)", lambda: (
        plan.run(), float(np.asarray(plan.run()["score"]).sum()))[0])
    bp_raw = out["bp_raw"]
    fstate = np.asarray(out["fstate"])

    NB, K1, _, _ = bp_raw.shape
    k1_pad = -(-K1 // tbp.CHUNK) * tbp.CHUNK

    def pad_rows():
        rows = jnp.asarray(bp_raw)
        pad = jnp.zeros((NB, k1_pad - K1, W, tbp.BT), jnp.int8)
        r = jnp.concatenate([rows, pad], axis=1)
        r.block_until_ready()
        return r

    bp_rows = t("bp pad+reshape (device)", pad_rows)

    def host_prep():
        d1p_l, o_last = tbp._d1_packed_lanes(offsets, NB, B, k1_pad, K1)
        mns = np.zeros((NB, 4, tbp.BT), np.int32)
        # production _lane_rows: building flat then assigning the whole
        # column — mns[:, i].reshape(-1)[:B] = v writes into a COPY at
        # NB > 1 (round-4 landmine; this probe measured empty walks)
        mns[:, 0] = tbp._lane_rows(m, NB, B)
        mns[:, 1] = tbp._lane_rows(n, NB, B)
        mns[:, 2] = tbp._lane_rows(fstate, NB, B)
        mns[:, 3] = o_last.reshape(NB, tbp.BT)
        return d1p_l, mns

    d1p_l, mns = t("host d1 pack + mns", host_prep)

    def walker():
        o = tbp._vit_tb_call(
            jnp.asarray(mns), bp_rows, jnp.asarray(d1p_l),
            k1_pad, NB, W, False,
        )
        p = tbp._pack_ops2(o)
        return np.asarray(p)

    packed = t("walker kernel + pack + pull", walker)

    ops = t("host unpack (LUT)", lambda: tbp._unpack_ops2(
        packed, NB, k1_pad))

    from nanopore_tpu.ops.mea import _rle_ops_row

    t("host RLE x B", lambda: [
        _rle_ops_row(ops[b][:K1]) for b in range(B)
    ])
    return 0


if __name__ == "__main__":
    sys.exit(main())
