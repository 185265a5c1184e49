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


@pytest.fixture(scope="module", autouse=True)
def _release_jit_code_maps():
    """Release XLA CPU JIT code maps between test modules.

    Every compiled CPU executable pins ~3 anonymous JIT-code mappings
    (code/rodata/data) for the PROCESS lifetime through jax's global
    compilation caches.  The full suite compiles enough kernel variants
    to cross the kernel's vm.max_map_count limit (65530 by default)
    near the end of the run, at which point LLVM's next mmap fails and
    the process SEGFAULTS inside backend_compile_and_load (or, with a
    persistent cache enabled, inside deserialize_executable) — always
    at ~94% of the suite, while any subset passes.  Clearing the
    caches per module releases the maps (measured: 1048 -> 478 maps
    after 60 compiles + clear); jitted functions recompile
    transparently on next use.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()


REFERENCE_TESTS = pathlib.Path("/root/reference/tests")


@pytest.fixture(scope="session")
def reference_test_data():
    """Paths to the bundled toy dataset (2 reads vs 1 ref), if present."""
    reads = REFERENCE_TESTS / "readFastqFiles" / "fake_readtype" / "reads.fq"
    ref = REFERENCE_TESTS / "referenceFastaFiles" / "reference.fa"
    if not reads.exists() or not ref.exists():
        pytest.skip("reference test data not mounted")
    return {"reads": str(reads), "ref": str(ref)}
