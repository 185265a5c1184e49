"""HW validation of anchor-split realign on long reads -> SPLIT_HW.json.

Round-5 (VERDICT r4 #4): windows past the Pallas HBM stream budget
split at guide anchors (align.realign.split_window_pair) instead of
falling back to the XLA scan.  Two checks on the real chip:

1. CORRECTNESS at scale, backend held fixed: split vs unsplit on the
   XLA path must produce identical cigars (the cut anchors are lattice
   points both runs pass through; cross-backend comparisons would only
   re-measure known Pallas-vs-XLA argmax ties, PARITY_HW).
2. THROUGHPUT, warm second pass on a BATCH of long reads: the split
   Pallas path vs the unsplit XLA fallback it replaces.  (A single
   read would waste 127/128 Pallas lanes — the production case is a
   batch of ultra-long reads.)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/split_hw_probe.py
  SPLIT_B=8 SPLIT_L=40000 SPLIT_REF=90000 SPLIT_K=32768 (defaults)
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
    B = int(os.environ.get("SPLIT_B", "8"))
    L = int(os.environ.get("SPLIT_L", "40000"))
    ref_len = int(os.environ.get("SPLIT_REF", "90000"))
    budget = int(os.environ.get("SPLIT_K", "32768"))
    W = 32
    rng = np.random.default_rng(0)

    from nanopore_tpu.align.model import PairHmmModel
    from nanopore_tpu.align.realign import realign_records
    from nanopore_tpu.io.encoding import decode
    from nanopore_tpu.io.sam import CIG, SamRecord, cigar_to_string

    print("devices:", jax.devices(), flush=True)
    x = rng.integers(0, 4, ref_len).astype(np.int8)
    ref = {"r": decode(x)}

    reads = []
    for _ in range(B):
        lead = int(rng.integers(0, ref_len - L))
        keep = rng.random(L) > 0.05
        y = x[lead : lead + L][keep]
        sub = rng.random(len(y)) < 0.1
        y = np.where(sub, rng.integers(0, 4, len(y)), y).astype(np.int8)
        # realistic guide following the simulated deletions (a chained
        # production guide tracks the true path; a single huge M run
        # would drift ~5%*L ref bases out of the W-band and diffuse the
        # posterior, making ANY lattice perturbation look large)
        mid: list = []
        for k in keep:
            op = CIG.M if k else CIG.D
            if mid and mid[-1][0] == op:
                mid[-1][1] += 1
            else:
                mid.append([op, 1])
        cigar = [(CIG.D, lead)] + [tuple(r) for r in mid] + [
            (CIG.D, ref_len - lead - L)
        ]
        reads.append((lead, len(y), decode(y), cigar))

    def records():
        return [
            SamRecord(
                qname="long%d" % i, flag=0, rname="r", pos=0, mapq=60,
                cigar=list(cigar), seq=seq,
            )
            for i, (lead, used, seq, cigar) in enumerate(reads)
        ]

    model = PairHmmModel.load("nanopore_tpu/models/blasr_hmm_0.txt")

    def run(split_k, kernel, label):
        os.environ["NANOPORE_TPU_SPLIT_K"] = str(split_k)
        if kernel:
            os.environ["NANOPORE_TPU_KERNEL"] = kernel
        else:
            os.environ.pop("NANOPORE_TPU_KERNEL", None)
        os.environ["NANOPORE_TPU_PALLAS_MAX_K"] = str(budget)
        best = None
        cigs = None
        for attempt in range(2):  # warm second pass is the number
            recs = records()
            t0 = time.time()
            realign_records(recs, ref, model, band_width=W)
            dt = time.time() - t0
            best = dt
            cigs = [cigar_to_string(r.cigar) for r in recs]
        print("%s: %.1fs warm" % (label, best), flush=True)
        return best, cigs

    # 1) correctness: split vs unsplit, XLA backend fixed.  At high
    # noise a cut anchor need not lie exactly on the unsplit MEA path,
    # so cigars may differ LOCALLY around cuts — the same lossiness the
    # reference accepts from --splitMatrixBiggerThanThis block
    # decomposition.  The criterion is per-read aligned-pair agreement:
    # the fraction of read bases mapped to the same ref position.
    def aligned_map(cigar_str, n_read):
        import re

        out = np.full(n_read, -1, np.int64)
        i = j = 0
        for ln, op in re.findall(r"(\d+)([MIDNSHP=X])", cigar_str):
            ln = int(ln)
            if op == "M":
                out[i : i + ln] = np.arange(j, j + ln)
                i += ln
                j += ln
            elif op == "I":
                i += ln
            else:
                j += ln
        return out

    t_x_split, c_x_split = run(budget, "xla", "xla split")
    t_x_full, c_x_full = run(1 << 30, "xla", "xla unsplit")
    identical = c_x_split == c_x_full
    agreements = []
    for (lead, used, _, _), cs, cf in zip(reads, c_x_split, c_x_full):
        a = aligned_map(cs, used)
        b = aligned_map(cf, used)
        agreements.append(float((a == b).mean()))
    min_agree = min(agreements)
    print("per-read aligned-pair agreement: min %.5f" % min_agree,
          flush=True)

    # 2) throughput: the production dispatch (split -> Pallas) vs the
    # unsplit XLA fallback it replaces
    t_pallas, c_p = run(budget, None, "pallas split")
    out = {
        "device": str(jax.devices()[0]),
        "date": time.strftime("%Y-%m-%d"),
        "batch": B,
        "read_length": int(np.mean([u for _, u, _, _ in reads])),
        "ref_length": ref_len,
        "band_width": W,
        "forced_budget_k": budget,
        "xla_split_vs_unsplit_cigars_identical": bool(identical),
        "min_aligned_pair_agreement": round(min_agree, 5),
        "warm_seconds": {
            "pallas_split": round(t_pallas, 1),
            "xla_split": round(t_x_split, 1),
            "xla_unsplit": round(t_x_full, 1),
        },
        "speedup_pallas_split_vs_xla_unsplit": round(
            t_x_full / max(t_pallas, 1e-9), 2
        ),
        "pass": bool(min_agree >= 0.999),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SPLIT_HW.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1), flush=True)
    assert min_agree >= 0.999, (
        "split/unsplit aligned-pair agreement below 99.9%%: %f"
        % min_agree
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
