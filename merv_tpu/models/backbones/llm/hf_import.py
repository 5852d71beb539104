"""HF-checkpoint → functional-decoder weight import.

The reference loads LLMs via HF ``from_pretrained`` (reference
``merv/models/backbones/llm/base_llm.py:114-138``); here we map an HF
Llama/Qwen2 state dict onto the :class:`LlamaDecoder` parameter pytree
(stacked-layer layout), including the pad-token embedding resize to a multiple
of 64 that the reference applies after adding ``<PAD>``
(``merv/models/backbones/llm/llama2.py:73-76``).

Works from either an in-memory state dict (tests use a tiny random HF torch
model) or a directory of ``*.safetensors`` shards.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Iterator, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from merv_tpu.models.backbones.llm.transformer import DecoderConfig

PyTree = Any


def _to_numpy(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (cpu) — avoid importing torch at module scope
    if hasattr(t, "detach"):
        t = t.detach()
        if t.dtype is not None and str(t.dtype) == "torch.bfloat16":
            return t.float().numpy().astype(np.float32)
        return t.numpy()
    return np.asarray(t)


def load_safetensors_dir(path: Path) -> Dict[str, np.ndarray]:
    """Load all *.safetensors shards in a directory into one dict (numpy)."""
    from safetensors.numpy import load_file

    state: Dict[str, np.ndarray] = {}
    files = sorted(Path(path).glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors shards under {path}")
    for f in files:
        state.update(load_file(str(f)))
    return state


def import_llama_state_dict(
    cfg: DecoderConfig,
    state: Mapping[str, Any],
    *,
    param_dtype: Any = jnp.float32,
) -> PyTree:
    """Map an HF LlamaForCausalLM/Qwen2ForCausalLM state dict to our pytree.

    HF stores linear weights as ``[out, in]``; ours are ``[in, out]`` so each
    kernel is transposed once at import. Embedding rows beyond the HF vocab
    (pad resize) are zero-initialized, matching ``resize_token_embeddings``'
    mean-init being immediately trained / unused at inference.
    """
    get = lambda k: _to_numpy(state[k])  # noqa: E731

    def linear_t(key: str) -> np.ndarray:
        return np.ascontiguousarray(get(key).T)

    def maybe_pad_vocab(w: np.ndarray, target_rows: int) -> np.ndarray:
        if w.shape[0] < target_rows:
            # new rows init to the mean embedding (HF resize_token_embeddings default)
            mean = w.mean(axis=0, keepdims=True)
            pad = np.repeat(mean, target_rows - w.shape[0], axis=0)
            w = np.concatenate([w, pad], axis=0)
        return w

    L = cfg.num_layers

    def stacked(fmt: str, transform) -> np.ndarray:
        return np.stack([transform(fmt.format(i)) for i in range(L)], axis=0)

    layers: Dict[str, Any] = {
        "attn": {
            "q_proj": {"kernel": stacked("model.layers.{}.self_attn.q_proj.weight", linear_t)},
            "k_proj": {"kernel": stacked("model.layers.{}.self_attn.k_proj.weight", linear_t)},
            "v_proj": {"kernel": stacked("model.layers.{}.self_attn.v_proj.weight", linear_t)},
            "o_proj": {"kernel": stacked("model.layers.{}.self_attn.o_proj.weight", linear_t)},
        },
        "mlp": {
            "gate_proj": {"kernel": stacked("model.layers.{}.mlp.gate_proj.weight", linear_t)},
            "up_proj": {"kernel": stacked("model.layers.{}.mlp.up_proj.weight", linear_t)},
            "down_proj": {"kernel": stacked("model.layers.{}.mlp.down_proj.weight", linear_t)},
        },
        "input_norm": {"scale": stacked("model.layers.{}.input_layernorm.weight", get)},
        "post_attn_norm": {"scale": stacked("model.layers.{}.post_attention_layernorm.weight", get)},
    }
    if cfg.attention_bias:
        layers["attn"]["q_proj"]["bias"] = stacked("model.layers.{}.self_attn.q_proj.bias", get)
        layers["attn"]["k_proj"]["bias"] = stacked("model.layers.{}.self_attn.k_proj.bias", get)
        layers["attn"]["v_proj"]["bias"] = stacked("model.layers.{}.self_attn.v_proj.bias", get)

    embed = maybe_pad_vocab(get("model.embed_tokens.weight"), cfg.vocab_size)
    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": embed},
        "layers": layers,
        "final_norm": {"scale": get("model.norm.weight")},
    }
    if not cfg.tie_word_embeddings:
        if "lm_head.weight" in state:
            head = get("lm_head.weight")
        else:  # tied in the checkpoint but untied config
            head = get("model.embed_tokens.weight")
        head = maybe_pad_vocab(head, cfg.vocab_size)
        params["lm_head"] = {"kernel": np.ascontiguousarray(head.T)}

    return _as_jnp(params, param_dtype)


def _as_jnp(tree: PyTree, dtype: Any) -> PyTree:
    import jax

    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype=dtype), tree)


def export_llama_state_dict(cfg: DecoderConfig, params: PyTree) -> Dict[str, np.ndarray]:
    """Inverse mapping (ours → HF keys), for checkpoint interchange."""
    out: Dict[str, np.ndarray] = {}
    out["model.embed_tokens.weight"] = np.asarray(params["embed_tokens"]["embedding"])
    out["model.norm.weight"] = np.asarray(params["final_norm"]["scale"])
    if not cfg.tie_word_embeddings:
        out["lm_head.weight"] = np.ascontiguousarray(np.asarray(params["lm_head"]["kernel"]).T)
    lp = params["layers"]
    for i in range(cfg.num_layers):
        for ours, theirs in [
            ("attn/q_proj", "self_attn.q_proj"),
            ("attn/k_proj", "self_attn.k_proj"),
            ("attn/v_proj", "self_attn.v_proj"),
            ("attn/o_proj", "self_attn.o_proj"),
            ("mlp/gate_proj", "mlp.gate_proj"),
            ("mlp/up_proj", "mlp.up_proj"),
            ("mlp/down_proj", "mlp.down_proj"),
        ]:
            node = lp
            for part in ours.split("/"):
                node = node[part]
            out[f"model.layers.{i}.{theirs}.weight"] = np.ascontiguousarray(np.asarray(node["kernel"][i]).T)
            if "bias" in node:
                out[f"model.layers.{i}.{theirs}.bias"] = np.asarray(node["bias"][i])
        out[f"model.layers.{i}.input_layernorm.weight"] = np.asarray(lp["input_norm"]["scale"][i])
        out[f"model.layers.{i}.post_attention_layernorm.weight"] = np.asarray(lp["post_attn_norm"]["scale"][i])
    return out
