"""On-device statistical reductions shared by the analyses.

The reference computes these with per-aligned-pair Python loops and
Counter dicts (e.g. substitutions.py:67-69, kmerAnalysis.py:12-30); here
they are jit'd bincounts/segment-sums that XLA fuses, and that shard
trivially over a device mesh (stat tensors all-reduce with psum —
SURVEY.md section 2.4).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def substitution_counts(ref_codes: jax.Array, read_codes: jax.Array) -> jax.Array:
    """(5, 5) substitution count matrix over aligned pairs.

    Index = refBase * 5 + readBase with N bucketed at 4 — the
    SubstitutionMatrix layout (reference substitutions.py:9-56).
    """
    idx = ref_codes.astype(jnp.int32) * 5 + read_codes.astype(jnp.int32)
    return jnp.bincount(idx, length=25).reshape(5, 5)


@functools.partial(jax.jit, static_argnames=("k",))
def kmer_count_vector(codes: jax.Array, k: int) -> jax.Array:
    """(4^k,) counts of valid (N-free) k-mers over a code array.

    Counts windows [i-k, i) for i in [k, len) — reproducing the
    reference's window enumeration (kmerAnalysis.py:16-19, which skips
    the final window) so k-mer tables diff cleanly against it.
    """
    n = codes.shape[0]
    if n < k + 1:
        return jnp.zeros(4**k, jnp.int32)
    codes = codes.astype(jnp.int32)
    windows = jnp.stack(
        [codes[t : n - k + 1 + t] for t in range(k)], axis=1
    )
    windows = windows[:-1]  # drop the final window like the reference
    powers = 4 ** jnp.arange(k - 1, -1, -1)
    idx = (jnp.where(windows < 4, windows, 0) * powers).sum(axis=1)
    valid = (windows < 4).all(axis=1)
    idx = jnp.where(valid, idx, 4**k)  # invalid windows to an overflow bin
    return jnp.bincount(idx, length=4**k + 1)[: 4**k]


def revcomp_kmer_counts(counts: np.ndarray, k: int) -> np.ndarray:
    """counts[kmer] -> counts[revcomp(kmer)] (precomputed permutation)."""
    idx = np.arange(4**k)
    rc = np.zeros_like(idx)
    tmp = idx.copy()
    for _ in range(k):
        rc = rc * 4 + (3 - (tmp % 4))
        tmp //= 4
    out = np.zeros_like(counts)
    np.add.at(out, rc, counts)
    return out


@jax.jit
def length_histogram(lengths: jax.Array, num_bins: int = 1 << 16) -> jax.Array:
    return jnp.bincount(jnp.clip(lengths, 0, num_bins - 1), length=num_bins)


@functools.partial(jax.jit, static_argnames=("ref_len",))
def positional_base_expectations(
    ref_positions: jax.Array,
    read_codes: jax.Array,
    probs: jax.Array,
    ref_len: int,
) -> jax.Array:
    """(ref_len, 4) expected base observations per reference position.

    The SNP caller's accumulation of posterior base expectations
    (reference marginAlignSnpCaller.py:149-155) as one scatter-add.
    """
    onehot = (
        read_codes[:, None] == jnp.arange(4)[None, :]
    ).astype(probs.dtype) * probs[:, None]
    return jnp.zeros((ref_len, 4), probs.dtype).at[ref_positions].add(onehot)
