"""Parameter-sharding rules: the TPU-native replacement for FSDP auto-wrap.

The reference composes per-backbone torch-FSDP auto-wrap policies
(``merv/models/vidlms/merv.py:465-497``, ``backbones/llm/base_llm.py:194-200``)
to decide which modules get sharded. On TPU the analogue is a *sharding rule
table*: an ordered list of ``(path-regex, PartitionSpec)`` entries matched
against the flattened parameter path; XLA SPMD then emits the all-gather /
reduce-scatter collectives that FSDP would have performed, fused into the
compiled step.

Two mechanisms are provided:

- :class:`PartitionRules` — explicit regex rules (used for tensor parallelism
  and module-specific layouts).
- :func:`infer_fsdp_spec` — generic ZeRO-3-style policy: shard the largest
  axis of every parameter that is divisible by the ``fsdp`` axis size,
  replicate the rest.  This subsumes the reference's per-module wrap policies:
  every transformer block weight is large and divisible, so it gets sharded,
  while tiny norms/bias vectors replicate.
"""

from __future__ import annotations

import contextlib
import re
from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from merv_tpu.parallel.mesh import FSDP_AXIS, PIPE_AXIS, TENSOR_AXIS

PyTree = Any


def path_str(path: Tuple[Any, ...]) -> str:
    """Flatten a jax.tree_util key path to 'a/b/c'."""
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/".join(parts)


class PartitionRules:
    """Ordered (regex, PartitionSpec) table; first match wins."""

    def __init__(self, rules: Sequence[Tuple[str, P]], default: Optional[P] = None):
        self.rules = [(re.compile(pat), spec) for pat, spec in rules]
        self.default = default

    def spec_for(self, path: str, leaf: Any = None) -> Optional[P]:
        for pat, spec in self.rules:
            if pat.search(path):
                return spec
        return self.default

    def tree_specs(self, params: PyTree) -> PyTree:
        return jax.tree_util.tree_map_with_path(lambda p, leaf: self.spec_for(path_str(p), leaf), params)


def infer_fsdp_spec(
    shape: Tuple[int, ...],
    fsdp_size: int,
    *,
    min_weight_size: int = 2**16,
    axis_name: str = FSDP_AXIS,
) -> P:
    """ZeRO-3-style auto-sharding for one parameter.

    Shards the largest dimension divisible by ``fsdp_size`` (ties broken toward
    the trailing dim, which keeps the 128-lane layout contiguous); parameters
    smaller than ``min_weight_size`` replicate (same spirit as FSDP leaving
    small leaves unwrapped).
    """
    if fsdp_size <= 1 or int(np.prod(shape)) < min_weight_size:
        return P()
    # candidate axes, prefer larger dims; tie-break toward later axes
    order = sorted(range(len(shape)), key=lambda i: (shape[i], i), reverse=True)
    for i in order:
        if shape[i] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[i] = axis_name
            return P(*spec)
    return P()


def fsdp_specs(
    params: PyTree,
    mesh: Mesh,
    *,
    min_weight_size: int = 2**16,
    overrides: Optional[PartitionRules] = None,
) -> PyTree:
    """PartitionSpec tree for a parameter pytree under FSDP auto-policy.

    ``overrides`` (e.g. tensor-parallel rules) take priority; a ``None`` from
    the override table falls through to the auto policy.

    When the mesh has a ``pp`` axis > 1, the LLM decoder's stacked layer
    params (every leaf ``[L, ...]`` under ``llm_backbone/layers/``, see
    ``LlamaDecoder.init``) shard their LAYER dim over ``pp``: each device
    stores only its pipeline stage's layers, which is the memory point of
    pipeline parallelism. FSDP then shards the remaining dims as usual, so
    pp x fsdp compose. The match is scoped to the LLM subtree on purpose:
    the vision towers ALSO stack per-layer params under a ``layers`` key
    (``vit.py init``), but they run outside the pipeline shard_map — pp-
    sharding them would force GSPMD cross-stage gathers on every tower layer.
    """
    fsdp_size = mesh.shape[FSDP_AXIS]
    pp_size = mesh.shape.get(PIPE_AXIS, 1)
    layers_re = re.compile(r"(^|/)llm_backbone/layers/")

    def _spec(path, leaf):
        shape = np.shape(leaf)
        stacked_pp = (
            pp_size > 1 and layers_re.search(path_str(path))
            and len(shape) >= 1 and shape[0] % pp_size == 0
        )
        if overrides is not None:
            s = overrides.spec_for(path_str(path), leaf)
            if s is not None:
                # compose pp with override rules (e.g. tensor-parallel specs
                # leave the stacked layer dim unspecified)
                if stacked_pp and (len(s) == 0 or s[0] is None):
                    s = P(PIPE_AXIS, *tuple(s)[1:])
                return s
        if stacked_pp:
            rest = infer_fsdp_spec(shape[1:], fsdp_size, min_weight_size=min_weight_size)
            return P(PIPE_AXIS, *tuple(rest))
        return infer_fsdp_spec(shape, fsdp_size, min_weight_size=min_weight_size)

    return jax.tree_util.tree_map_with_path(_spec, params)


def replicated_specs(params: PyTree) -> PyTree:
    return jax.tree_util.tree_map(lambda _: P(), params)


def to_named_shardings(specs: PyTree, mesh: Mesh) -> PyTree:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda x: isinstance(x, P)
    )


def shard_params(params: PyTree, specs: PyTree, mesh: Mesh) -> PyTree:
    """Place a parameter pytree onto the mesh according to ``specs``."""
    shardings = to_named_shardings(specs, mesh)
    return jax.device_put(params, shardings)


def constrain(x: jax.Array, mesh: Mesh, spec: P) -> jax.Array:
    """``with_sharding_constraint`` that no-ops off-mesh (single-device tests)."""
    if int(np.prod(list(mesh.shape.values()))) == 1:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


# --- Activation sharding constraints ---------------------------------------------
# Without explicit constraints, SPMD sharding propagation is free to resolve
# the batch-sharded-activations x fsdp-sharded-weights conflict by ALL-
# GATHERING activations to full batch size (observed in the AOT memory proof:
# replicated [128, 3072, 4096] hidden-state buffers = 6.4 GiB/device each).
# Model code calls :func:`constrain_batch_dim` at layer boundaries; it is a
# no-op until a strategy / entry point registers the active mesh.

_ACTIVATION_MESH: Optional[Mesh] = None


def set_activation_mesh(mesh: Optional[Mesh]) -> None:
    """Register (or clear, with None) the mesh used by activation constraints.

    Prefer the scoped :func:`activation_mesh` context manager: a permanent
    global registration leaks a training mesh into every later trace in the
    process (e.g. single-chip serving after a training run).
    """
    global _ACTIVATION_MESH
    _ACTIVATION_MESH = mesh


def get_activation_mesh() -> Optional[Mesh]:
    """The mesh registered for activation constraints at this trace point
    (None outside a training/serving scope). Model code uses it to pick
    mesh-aware ops — e.g. the decoder routes attention through the sp-axis
    ring when the active mesh has sequence parallelism."""
    return _ACTIVATION_MESH


@contextlib.contextmanager
def activation_mesh(mesh: Optional[Mesh]):
    """Scope the activation-constraint mesh to a trace: with_sharding_constraint
    ops are recorded at TRACE time, so wrapping the traced callable's body is
    enough — and nothing leaks once the scope exits."""
    global _ACTIVATION_MESH
    prev = _ACTIVATION_MESH
    _ACTIVATION_MESH = mesh
    try:
        yield
    finally:
        _ACTIVATION_MESH = prev


def constrain_batch_dim(x: jax.Array) -> jax.Array:
    """Pin a batch-leading activation to stay sharded over the data/fsdp axes.

    No-op when no activation mesh is registered, when neither batch axis is
    >1, or when the leading dim doesn't divide the axis product (tiny test
    batches).
    """
    mesh = _ACTIVATION_MESH
    if mesh is None or not hasattr(x, "ndim") or x.ndim == 0:
        return x
    from merv_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS

    axes = [a for a in (DATA_AXIS, FSDP_AXIS) if mesh.shape.get(a, 1) > 1]
    if not axes:
        return x
    total = int(np.prod([mesh.shape[a] for a in axes]))
    if x.shape[0] % total != 0:
        return x
    spec = P(tuple(axes) if len(axes) > 1 else axes[0], *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


# --- Tensor-parallel rule tables -------------------------------------------------
# Used when mesh 'tensor' axis > 1; matched against llama/qwen parameter paths
# (see merv_tpu/models/backbones/llm/llama.py param layout).

def llm_tensor_parallel_rules() -> PartitionRules:
    """Megatron-style column/row split; layer kernels are STACKED [L, in, out]."""
    return PartitionRules(
        [
            # attention: shard heads (output dim of q/k/v kernels, input of o)
            (r"attn/(q|k|v)_proj/kernel(_q)?$", P(None, None, TENSOR_AXIS)),
            (r"attn/(q|k|v)_proj/bias$", P(None, TENSOR_AXIS)),
            (r"attn/o_proj/kernel(_q)?$", P(None, TENSOR_AXIS, None)),
            # mlp: shard ffn dim
            (r"mlp/(gate|up)_proj/kernel(_q)?$", P(None, None, TENSOR_AXIS)),
            (r"mlp/down_proj/kernel(_q)?$", P(None, TENSOR_AXIS, None)),
            # weight-only int8 serving (nn/quantization.py): per-output-channel
            # scales [L, 1, out] follow their kernel's OUTPUT dim — column-
            # parallel scales shard with the heads/ffn split; row-parallel
            # kernels (o/down) keep full output channels per chip, so their
            # scales replicate (the default)
            (r"attn/(q|k|v)_proj/scale$", P(None, None, TENSOR_AXIS)),
            (r"mlp/(gate|up)_proj/scale$", P(None, None, TENSOR_AXIS)),
            # embeddings / lm head: shard vocab (unstacked)
            (r"embed_tokens/embedding$", P(TENSOR_AXIS, None)),
            (r"lm_head/kernel(_q)?$", P(None, TENSOR_AXIS)),
            (r"lm_head/scale$", P(None, TENSOR_AXIS)),
        ],
        default=None,
    )
