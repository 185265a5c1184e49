"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding paths are
exercised on a virtual CPU mesh per the project test strategy
(SURVEY.md section 4).  Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
