"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding paths are
exercised on a virtual CPU mesh per the project test strategy
(SURVEY.md section 4).  Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon TPU tunnel out
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize force-registers the remote "axon" TPU
# backend and pins jax_platforms=axon; undo that for the test session so
# kernels compile on the local 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pytest


REFERENCE_TESTS = pathlib.Path("/root/reference/tests")


@pytest.fixture(scope="session")
def reference_test_data():
    """Paths to the bundled toy dataset (2 reads vs 1 ref), if present."""
    reads = REFERENCE_TESTS / "readFastqFiles" / "fake_readtype" / "reads.fq"
    ref = REFERENCE_TESTS / "referenceFastaFiles" / "reference.fa"
    if not reads.exists() or not ref.exists():
        pytest.skip("reference test data not mounted")
    return {"reads": str(reads), "ref": str(ref)}
