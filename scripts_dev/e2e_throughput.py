"""End-to-end mapping throughput: FASTQ -> SAM on synthetic reads.

Measures the whole production path — parse, seed/chain, host pack,
prefetch-overlapped upload, fused realign kernel, traceback, SAM write —
against the kernel-only ceiling from bench.py.  VERDICT round-1 target:
e2e within ~1.3x of kernel-only reads/s.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/e2e_throughput.py
  E2E_READS=2000 E2E_L=5000 ... (defaults below)
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
    n_reads = int(os.environ.get("E2E_READS", "2000"))
    L = int(os.environ.get("E2E_L", "5000"))
    ref_len = int(os.environ.get("E2E_REFLEN", "1000000"))
    rng = np.random.default_rng(0)

    from nanopore_tpu.io.encoding import decode
    from nanopore_tpu.mapping.engine import MappingEngine, MapperConfig

    ref_codes = rng.integers(0, 4, ref_len).astype(np.int8)
    ref = decode(ref_codes)
    print("devices:", jax.devices(), flush=True)

    fastq = "/tmp/e2e_reads.fq"
    with open(fastq, "w") as fh:
        for r in range(n_reads):
            start = int(rng.integers(0, ref_len - L))
            x = ref_codes[start:start + L]
            keep = rng.random(L) > 0.05
            y = x[keep]
            sub = rng.random(len(y)) < 0.1
            y = np.where(sub, rng.integers(0, 4, len(y)), y).astype(np.int8)
            seq = decode(y)
            fh.write("@read_%d\n%s\n+\n%s\n" % (r, seq, "I" * len(seq)))

    t0 = time.time()
    eng = MappingEngine({"ref": ref}, MapperConfig())
    t_index = time.time() - t0
    print("index build %.1fs" % t_index, flush=True)

    t0 = time.time()
    n = eng.map_fastq(fastq, "/tmp/e2e_out.sam")
    elapsed = time.time() - t0
    print(
        "mapped %d records from %d reads in %.1fs = %.1f reads/s"
        % (n, n_reads, elapsed, n_reads / elapsed),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
