"""Single-node CPU FASTQ->SAM pipeline baseline (VERDICT r3 missing #3).

BASELINE.md's north star is "reads/s vs single-node CPU pipeline"
(the reference's own deployment unit, /root/reference/Makefile:1-3);
until round 4 only the realign-KERNEL baseline was measured.  This
runs THIS repo's engine end to end on CPU (XLA kernels, all host
stages identical) over the same synthetic workload as
scripts_dev/e2e_throughput.py and merges the number into
BASELINE_MEASURED.json, which bench.py reports as the e2e
``vs_cpu_pipeline`` ratio.

Run on a QUIET box (no concurrent TPU jobs — their host threads
deflate this number):

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu NANOPORE_TPU_KERNEL=xla \
      PYTHONPATH=/root/repo python scripts_dev/e2e_cpu_baseline.py

  CPU_E2E_READS=200 (default) — reads measured; reads/s is the metric,
  so the subset size only affects noise, not the headline.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("NANOPORE_TPU_KERNEL", "xla")

import jax  # noqa: E402


def main():
    n_reads = int(os.environ.get("CPU_E2E_READS", "200"))
    L = int(os.environ.get("E2E_L", "5000"))
    ref_len = int(os.environ.get("E2E_REFLEN", "1000000"))
    rng = np.random.default_rng(0)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from e2e_throughput import write_reads  # same generator / noise model

    from nanopore_tpu.io.encoding import decode
    from nanopore_tpu.mapping.engine import MappingEngine, MapperConfig

    backend = jax.default_backend()
    assert backend == "cpu", "run with JAX_PLATFORMS=cpu (got %s)" % backend
    print("devices:", jax.devices(), flush=True)

    ref_codes = rng.integers(0, 4, ref_len).astype(np.int8)
    ref = decode(ref_codes)
    fastq = "/tmp/e2e_cpu_reads.fq"
    write_reads(fastq, rng, ref_codes, [L] * n_reads)

    # same engine config as the TPU e2e run (seed_stride included) so
    # the vs_cpu_pipeline ratio compares identical host pipelines
    eng = MappingEngine({"ref": ref}, MapperConfig(seed_stride=3))
    results = {}
    for label in ("cold", "warm"):
        t0 = time.time()
        n = eng.map_fastq(fastq, "/tmp/e2e_cpu_%s.sam" % label)
        elapsed = time.time() - t0
        results[label] = {
            "records": n,
            "seconds": round(elapsed, 1),
            "reads_per_sec": round(n_reads / elapsed, 3),
        }
        print(
            "cpu %s: %d records / %d reads in %.1fs = %.2f reads/s"
            % (label, n, n_reads, elapsed, n_reads / elapsed),
            flush=True,
        )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_MEASURED.json",
    )
    with open(path) as fh:
        base = json.load(fh)
    base["e2e_cpu_pipeline"] = {
        "reads_per_sec": results["warm"]["reads_per_sec"],
        "reads": n_reads,
        "read_length": L,
        "ref_length": ref_len,
        "kernel": "xla",
        "seed_stride": 3,
        "cpu_count": os.cpu_count(),
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "cold": results["cold"],
        "note": (
            "this repo's own engine on CPU (XLA scans), identical host "
            "stages and workload to E2E_HW.json; quiet-box measurement"
        ),
    }
    with open(path, "w") as fh:
        json.dump(base, fh, indent=1)
    print("wrote", path, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
