"""nanopore_tpu — a TPU-native nanopore read mapping and analysis engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
mitenjain/nanopore pipeline (reference mounted at /root/reference):

- one unified seed→chain→banded-extend mapper (replacing the bwa / last /
  lastz / blasr mapper zoo, reference ``nanopore/mappers/*``),
- a batched banded 5-state pair-HMM kernel serving realignment, alignment
  uncertainty, Baum-Welch EM training and SNP posterior expectation
  (replacing every exec of ``cactus_realign`` /
  ``cactus_expectationMaximisation``, reference ``nanopore/analyses/utils.py``),
- analyses and meta-analyses as on-device reductions over batched alignment
  tensors (replacing per-aligned-pair Python loops + R scripts),
- a host-side experiment DAG scheduler with DONE-marker resume semantics
  (replacing jobTree).

Compute path: JAX + Pallas on TPU, sharded over a ``jax.sharding.Mesh``.
Host path: NumPy + a C++ seed-index extension (``nanopore_tpu.runtime``).
"""

__version__ = "0.1.0"
