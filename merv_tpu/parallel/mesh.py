"""Device-mesh construction and runtime initialization.

TPU-native replacement for the reference's torch.distributed/NCCL stack
(reference ``merv/training/strategies/fsdp.py``, ``merv/overwatch/overwatch.py:53``):
instead of one process per GPU with NCCL collectives, we build a single
``jax.sharding.Mesh`` over all addressable TPU devices and let XLA SPMD insert
collectives (all-gather / reduce-scatter / psum) over ICI from sharding
annotations.

Axes:
- ``data``   — data parallelism (batch dimension)
- ``fsdp``   — parameter/optimizer sharding (ZeRO-like); rides ICI
- ``tensor`` — tensor parallelism for very large LLMs (optional, default 1)
- ``sp``     — sequence/context parallelism for long-video token counts
  (optional, default 1): decoder activations shard the sequence dim and
  attention runs as a ring over ICI (``merv_tpu/ops/ring_attention.py``).
  The reference has NO long-sequence story beyond flash-attn
  (reference ``merv/conf/models.py:117`` caps llm_max_length at 2048); this
  axis is the TPU-native capability extension SURVEY §5.7 calls for.
- ``pp``     — pipeline parallelism over decoder DEPTH (optional, default 1):
  the stacked LLM layer params shard their layer dim over ``pp`` and the
  no-cache forward runs a microbatched GPipe schedule with activations
  hopping stages via ``ppermute`` (``merv_tpu/parallel/pipeline.py``).
  Capability beyond the reference (its FSDP story tops out at one 8-GPU
  node, reference ``merv/training/strategies/fsdp.py``); on TPU this is
  what lets the 13B llama2 recipes (``conf/models.py`` reproduction-llava
  variants) train on pods where fsdp-only hits the per-chip HBM wall.

The reference's ``fsdp-shard-grad-op`` / ``fsdp-full-shard`` strategies map to
how parameters/optimizer state are laid out over the ``fsdp`` axis (see
``merv_tpu/training/strategies``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
SEQ_AXIS = "sp"
PIPE_AXIS = "pp"
MESH_AXES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS, SEQ_AXIS, PIPE_AXIS)

_runtime_initialized = False


def initialize_runtime() -> None:
    """Initialize multi-host JAX if launched in a multi-process world.

    Single-process (the common case for one TPU VM / CPU tests) is a no-op.
    Equivalent in role to the reference's implicit
    ``accelerate.PartialState`` → ``torch.distributed.init_process_group``
    (reference ``merv/overwatch/overwatch.py:50-53``).
    """
    global _runtime_initialized
    if _runtime_initialized:
        return
    if int(os.environ.get("JAX_PROCESS_COUNT", os.environ.get("WORLD_SIZE", "1"))) > 1 and "JAX_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
    _runtime_initialized = True


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape. ``-1`` means "absorb all remaining devices"."""

    data: int = 1
    fsdp: int = -1
    tensor: int = 1
    seq: int = 1
    pipe: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int, int, int]:
        dims = [self.data, self.fsdp, self.tensor, self.seq, self.pipe]
        if dims.count(-1) > 1:
            raise ValueError("At most one mesh axis may be -1")
        known = int(np.prod([d for d in dims if d != -1]))
        if -1 in dims:
            if n_devices % known != 0:
                raise ValueError(f"{n_devices} devices not divisible by fixed axes {dims}")
            dims[dims.index(-1)] = n_devices // known
        if int(np.prod(dims)) != n_devices:
            raise ValueError(f"Mesh {dims} does not cover {n_devices} devices")
        return tuple(dims)  # type: ignore[return-value]


def build_mesh(
    config: Optional[MeshConfig] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the global device mesh.

    Device order comes from ``jax.devices()`` whose ordering already follows
    the physical ICI topology for TPU slices, so adjacent mesh coordinates are
    ICI neighbors and FSDP all-gathers ride ICI, not DCN.
    """
    initialize_runtime()
    config = config or MeshConfig()
    if devices is None:
        devices = jax.devices()
    shape = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, MESH_AXES)


def single_device_mesh() -> Mesh:
    """A single-device mesh over the default device (inference / tests)."""
    return Mesh(np.asarray(jax.devices()[:1]).reshape((1,) * len(MESH_AXES)), MESH_AXES)


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec for batch-leading activations: shard batch over data+fsdp."""
    axes = [ax for ax in (DATA_AXIS, FSDP_AXIS) if mesh.shape[ax] > 1]
    if not axes:
        return P()
    return P(tuple(axes) if len(axes) > 1 else axes[0])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec(mesh))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def check_bfloat16_supported() -> bool:
    """bf16 is native on every TPU generation (and on CPU via XLA emulation).

    Counterpart of the reference's CUDA/NCCL bf16 capability check
    (``merv/util/torch_utils.py:80-95``); on TPU this is unconditionally true.
    """
    platform = jax.devices()[0].platform
    return platform in ("tpu", "cpu", "axon") or True
