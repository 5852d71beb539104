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
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# sitecustomize may pre-import jax before this conftest runs, freezing the
# platform config from the ambient JAX_PLATFORMS — override it explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from merv_tpu.parallel import MeshConfig, build_mesh

    return build_mesh(MeshConfig(data=2, fsdp=4, tensor=1))


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
