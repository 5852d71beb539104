"""Multi-encoder feature-fusion adapters.

Capability parity with the reference fusion modules
(reference ``merv/util/nn_utils.py:455-537`` and the inline fusion dispatch in
``merv/models/vidlms/merv.py:211-227,599-612``):

- :class:`CrossAttentionAdapterLearnableQuery` — the default
  ``cross_attention_avg_lq`` fusion: a single learned query (dim 3072) attends
  over per-encoder summaries to produce per-encoder mixing weights; the fused
  stream is the weight-blended stack of the full per-encoder token streams.
- :class:`ScalarAdapter` — softmax over learned scalars mixing the streams.
- channel-concat fusions (``concat_channel``, ``concat_channel_ln``) are built
  from :class:`~merv_tpu.nn.projectors.LinearProjector` + LayerNorm inside the
  VidLM; token-concat (``concat``) and ``first`` are pure reshapes there.

TPU notes: the attention here is a [B,1,E] softmax over E<=4 encoders — tiny;
the expensive op is the final ``bmm(weights, V)`` blending [B, E, T*C], which
XLA fuses into one GEMM. The torch ``nn.MultiheadAttention`` v-projection and
out-projection parameters are retained in the pytree (zero-gradient, unused by
the forward) purely for checkpoint interchange with the reference layout.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from merv_tpu.nn.core import Linear, Module, kaiming_uniform

Array = jax.Array
PyTree = Any


def xavier_uniform(key: Array, shape: Tuple[int, ...], dtype: Any) -> Array:
    fan_in, fan_out = shape[-1], shape[-2] if len(shape) > 1 else shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound).astype(dtype)


@dataclass(frozen=True)
class CrossAttentionAdapterLearnableQuery(Module):
    """Learned-query encoder mixer (reference nn_utils.py:455-521).

    ``__call__(params, V)`` with V a list of E arrays ``[B, T, llm_dim]``
    (T == token_length, or 1 which broadcasts) returns
    ``([B, token_length, llm_dim], weights [B, E])``.

    Parameter layout mirrors torch ``nn.MultiheadAttention`` with
    ``kdim = vdim = llm_dim`` (averagetoken) or ``token_length*llm_dim``:
    separate q/k/v projection matrices + in_proj bias + out_proj. Only the
    q/k path affects the output (the reference discards the attention output
    and uses the raw weights); v/out_proj are checkpoint-compat placeholders.
    """

    embed_dim: int = 3072
    llm_dim: int = 4096
    token_length: int = 8
    averagetoken: bool = False
    num_encoder: int = 4
    positional_embedding: bool = False
    param_dtype: Any = jnp.float32

    @property
    def kdim(self) -> int:
        return self.llm_dim if self.averagetoken else self.token_length * self.llm_dim

    def init(self, key: Array) -> PyTree:
        ks = jax.random.split(key, 6)
        d, kd = self.embed_dim, self.kdim
        p: dict = {
            "Q": xavier_uniform(ks[0], (1, d), self.param_dtype),
            "attention": {
                # torch MHA _reset_parameters: xavier_uniform weights, zero in_proj bias
                "q_proj": {"kernel": xavier_uniform(ks[1], (d, d), self.param_dtype).T,
                           "bias": jnp.zeros((d,), self.param_dtype)},
                "k_proj": {"kernel": xavier_uniform(ks[2], (d, kd), self.param_dtype).T,
                           "bias": jnp.zeros((d,), self.param_dtype)},
                "v_proj": {"kernel": xavier_uniform(ks[3], (d, kd), self.param_dtype).T,
                           "bias": jnp.zeros((d,), self.param_dtype)},
                "out_proj": Linear(d, d, param_dtype=self.param_dtype).init(ks[4]),
            },
        }
        if self.positional_embedding:
            p["pe"] = xavier_uniform(ks[5], (self.num_encoder, self.llm_dim), self.param_dtype)
        return p

    def __call__(self, params: PyTree, V: List[Array]) -> Tuple[Array, Array]:
        T, C = self.token_length, self.llm_dim
        for emb in V:
            assert emb.shape[1] in (T, 1), (T, [e.shape for e in V])
        B = V[0].shape[0]
        E = len(V)
        dtype = V[0].dtype

        V = [jnp.broadcast_to(emb, (B, T, C)) if emb.shape[1] == 1 else emb for emb in V]
        stacked = jnp.stack(V, axis=1)  # [B, E, T, C]

        q = params["Q"].astype(dtype)[None]  # [1, 1, d]
        q = jnp.broadcast_to(q, (B, 1, self.embed_dim))
        q = q @ params["attention"]["q_proj"]["kernel"].astype(dtype) + params["attention"]["q_proj"]["bias"].astype(dtype)

        if self.averagetoken:
            keys = stacked.mean(axis=2)  # [B, E, C]
            if self.positional_embedding:
                keys = keys + params["pe"].astype(dtype)[None]
        else:
            keys = stacked.reshape(B, E, T * C)
        k = keys @ params["attention"]["k_proj"]["kernel"].astype(dtype) + params["attention"]["k_proj"]["bias"].astype(dtype)

        # single-head attention weights over encoders (softmax in fp32)
        logits = jnp.einsum("bqd,bed->bqe", q, k).astype(jnp.float32) / math.sqrt(self.embed_dim)
        weights = jax.nn.softmax(logits, axis=-1).astype(dtype)  # [B, 1, E]

        flat = stacked.reshape(B, E, T * C)
        fused = jnp.einsum("bqe,bec->bqc", weights, flat).reshape(B, T, C)
        return fused, weights[:, 0]


@dataclass(frozen=True)
class ScalarAdapter(Module):
    """Softmax over learned scalars mixing encoder streams (reference
    nn_utils.py:524-537; the reference hardcodes 4 scalars — we size by
    ``num_encoder``, identical for the shipped 4-encoder configs)."""

    num_encoder: int = 4
    param_dtype: Any = jnp.float32

    def init(self, key: Array) -> PyTree:
        return {"scalar": jax.random.normal(key, (self.num_encoder,), jnp.float32).astype(self.param_dtype)}

    def __call__(self, params: PyTree, V: List[Array]) -> Tuple[Array, Array]:
        stacked = jnp.stack(V, axis=0)  # [E, B, T, C]
        mix = jax.nn.softmax(params["scalar"].astype(jnp.float32), axis=0).astype(stacked.dtype)
        fused = jnp.einsum("e,ebtc->btc", mix, stacked)
        return fused, jnp.broadcast_to(mix[None], (1, self.num_encoder))
