"""Weight-only int8 quantization for frozen serving weights.

TPU rationale: decode is HBM-bandwidth-bound (every step streams all decoder
weights); storing kernels as int8 + per-output-channel fp scales halves the
bytes read — XLA fuses the upcast-and-scale into the matmul so the MXU still
computes in bf16. Also halves resident weight memory, unlocking larger prefill
batches on small-HBM chips (v5e: 7B bf16 = 13.4 GB of 16 GB).

Mechanics: symmetric per-output-channel quantization of every 2-D+ ``kernel``
leaf (stacked layer kernels [L, in, out] get per-(L, out) scales). The
quantized leaf is stored as ``{"kernel_q": int8, "scale": f32}`` and
:class:`merv_tpu.nn.core.Linear` transparently consumes either layout.

No quality claims are made here — this is an opt-in serving mode
(``quantize_tree`` at load time); training always uses full precision.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

PyTree = Any
Array = jax.Array


def quantize_kernel(w: Array) -> dict:
    """[..., in, out] float -> {"kernel_q": int8, "scale": f32[..., 1, out]}."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # per output column
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"kernel_q": q, "scale": scale.astype(jnp.float32)}


def dequantize_kernel(qleaf: dict, dtype: Any = jnp.float32) -> Array:
    return (qleaf["kernel_q"].astype(jnp.float32) * qleaf["scale"]).astype(dtype)


def apply_quantized(x: Array, qleaf: dict) -> Array:
    """x @ dequant(kernel) with the upcast fused into the matmul read."""
    y = x @ qleaf["kernel_q"].astype(x.dtype)
    return y * qleaf["scale"].astype(x.dtype)[..., 0, :]


def quantize_tree(params: PyTree, skip_keys: Sequence[str] = ("embed_tokens",)) -> PyTree:
    """Quantize every ``kernel`` leaf (ndim>=2) outside ``skip_keys`` subtrees.

    Embeddings stay full precision (gathers don't benefit; rounding the
    embedding table hurts most).
    """

    def walk(node: PyTree, path: tuple) -> PyTree:
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in skip_keys:
                    out[k] = v
                elif k == "kernel" and getattr(v, "ndim", 0) >= 2:
                    out.update(quantize_kernel(v))
                else:
                    out[k] = walk(v, path + (k,))
            return out
        return node

    return walk(params, ())
