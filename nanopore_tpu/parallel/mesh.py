"""Device-mesh construction and sharding helpers.

The TPU-native replacement for the reference's batch-system parallelism
(singleMachine / parasol / gridEngine over a shared filesystem,
reference Makefile:1-3, SURVEY.md section 2.4): reads shard
data-parallel over the ``dp`` mesh axis, EM random-restart trials shard
over the ``trial`` axis (the reference forks them as jobTree children,
utils.py:514,528), and statistic tensors all-reduce over ``dp``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TRIAL_AXIS = "trial"


def make_mesh(
    n_devices: int | None = None, n_trials: int = 1
) -> Mesh:
    """A (dp, trial) mesh over the available devices.

    The trial axis gets the largest divisor of n_devices that is <=
    n_trials; the rest goes to data parallelism.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    trial = 1
    for cand in range(min(n_trials, n), 0, -1):
        if n % cand == 0:
            trial = cand
            break
    dp = n // trial
    mesh_devices = np.array(devices).reshape(dp, trial)
    return Mesh(mesh_devices, (DP_AXIS, TRIAL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (read-batch) axis over dp, replicate over trial."""
    return NamedSharding(mesh, P(DP_AXIS))


def trial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (trial) axis over trial, replicate over dp."""
    return NamedSharding(mesh, P(TRIAL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_to(arrays: dict, multiple: int) -> dict:
    """Pad leading dims to a multiple so they divide the dp axis."""
    out = {}
    for key, arr in arrays.items():
        b = arr.shape[0]
        pad = (-b) % multiple
        if pad:
            pad_block = np.zeros((pad,) + arr.shape[1:], arr.dtype)
            arr = np.concatenate([np.asarray(arr), pad_block], axis=0)
        out[key] = arr
    return out
