"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of the reference's "single-GPU torchrun debug
path" (reference ``scripts/pretrain_video.py:21``): multi-chip sharding logic is
validated on XLA's host-platform virtual devices without real hardware.
"""

import os

# Must be set before jax is imported anywhere. Force CPU even when the
# environment pins a hardware platform (e.g. JAX_PLATFORMS=axon for the real chip).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# sitecustomize may pre-import jax before this conftest runs, freezing the
# platform config from the ambient JAX_PLATFORMS — override it explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Bound live JIT code across the suite.
#
# Module-level ``jax.jit`` functions in the package (decode chunks, insert/
# splice programs, train steps, ...) never die, so their executable caches
# accumulate one compiled CPU program per distinct shape across EVERY test.
# ~270 tests in, the accumulated live JIT code deterministically SIGSEGV'd the
# XLA CPU compiler (libgcc unwinder, page-aligned read fault inside
# ``backend.compile_and_load``) while every test file passes in isolation.
# Pinning executables made the crash happen EARLIER and serializing codegen
# (--xla_cpu_parallel_codegen_split_count=1) did not move it — the trigger is
# total live compiled-code volume, not concurrency. Clearing jax's caches
# between test modules keeps live code bounded by the largest single module;
# cross-module program reuse is negligible, so suite time is unaffected.
@pytest.fixture(autouse=True, scope="module")
def _bound_live_jit_code():
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def mesh8():
    from merv_tpu.parallel import MeshConfig, build_mesh

    return build_mesh(MeshConfig(data=2, fsdp=4, tensor=1))


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
