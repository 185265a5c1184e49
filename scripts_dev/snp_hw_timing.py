"""SNP-caller posterior wall time: Pallas batch-128 vs XLA batch-4.

VERDICT r2 #3 done-criterion: the posterior-expectation pass (the
--outputAllPosteriorProbs hot path, reference
marginAlignSnpCaller.py:136-155) must drop ~an order of magnitude on
TPU.  This times MarginAlignSnpCaller._posteriors_for_hmm — the whole
per-HMM posterior computation (pack, upload, kernel, device
expectation reduction) — under both backends on the same experiment.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/snp_hw_timing.py
  SNP_READS=48 SNP_REFLEN=30000 SNP_L=4000 (defaults)
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


def main():
    n_reads = int(os.environ.get("SNP_READS", "48"))
    ref_len = int(os.environ.get("SNP_REFLEN", "30000"))
    L = int(os.environ.get("SNP_L", "4000"))
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    from nanopore_tpu.align.model import PairHmmModel
    from nanopore_tpu.analyses.snp_caller import MarginAlignSnpCaller
    from nanopore_tpu.io.encoding import decode
    from nanopore_tpu.io.sam import CIG

    ref_codes = rng.integers(0, 4, ref_len).astype(np.int8)

    class FakeRec:
        def __init__(self, name, seq, cigar):
            self.qname = name
            self.rname = "ref"
            self.query = seq
            self.cigar = cigar

    class FakeData:
        pass

    data = FakeData()
    data.ref_codes = {"ref": ref_codes}
    data.records = []
    for r in range(n_reads):
        start = int(rng.integers(0, ref_len - L))
        x = ref_codes[start:start + L]
        keep = rng.random(L) > 0.05
        y = x[keep]
        sub = rng.random(len(y)) < 0.1
        y = np.where(sub, rng.integers(0, 4, len(y)), y).astype(np.int8)
        m = len(y)
        # chained global record: leading/trailing D runs + M body
        cigar = []
        if start:
            cigar.append((CIG.D, start))
        cigar.append((CIG.M, m))
        mid_ref = start + m
        if ref_len > mid_ref:
            cigar.append((CIG.D, ref_len - mid_ref))
        data.records.append(FakeRec("r%d" % r, decode(y), cigar))

    model = PairHmmModel.load("nanopore_tpu/models/blasr_hmm_0.txt")
    analysis = MarginAlignSnpCaller.__new__(MarginAlignSnpCaller)
    analysis.band_width = 64
    analysis.batch_size = None

    modes = (
        ("pallas", "xla")
        if jax.default_backend() in ("tpu", "axon")
        else ("xla",)
    )
    # the XLA comparison leg on TPU consumes forward_backward gammas,
    # which production now refuses (require_gamma_safe_backend); this
    # is a timing probe, so opt in explicitly
    os.environ["NANOPORE_TPU_ALLOW_TPU_GAMMA"] = "1"
    for mode in modes:
        os.environ["NANOPORE_TPU_KERNEL"] = mode
        t0 = time.time()
        out = analysis._posteriors_for_hmm(data, model)
        first = time.time() - t0
        t0 = time.time()
        out = analysis._posteriors_for_hmm(data, model)
        warm = time.time() - t0
        total = float(sum(e.sum() for e in out))
        print(
            "%s: first(+compile) %.1fs  warm %.2fs  (%.1f reads/s, "
            "expectation mass %.1f)"
            % (mode, first, warm, n_reads / warm, total),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
