"""Import reference-format MERV torch checkpoints into our parameter pytrees.

The reference saves ``{"model": {"projectors": ..., "llm_backbone": ...,
"feature_fusion": ...}, "optimizer", ...}`` with torch module state dicts
(reference ``merv/training/strategies/fsdp.py:111-142``), plus legacy-key
migration ``projector -> projectors."0."`` and ``adapter -> feature_fusion``
(``merv/models/vidlms/merv.py:246-299``). This module converts those state
dicts (torch ``[out, in]`` kernels, Sequential integer indices, MultiheadAttention
packed biases) into the functional pytrees used here, so released reference
checkpoints (HF ``tyleryzhu/merv``) load directly for logit-parity evaluation.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from merv_tpu.nn.fusion import CrossAttentionAdapterLearnableQuery, ScalarAdapter
from merv_tpu.nn.projectors import (
    AttentivePooler,
    AveragePooling3DProjector,
    AveragePoolingProjector,
    Convolutional3DProjector,
    ConvolutionalProjector,
    FusedMLPProjector,
    Identity,
    LinearProjector,
    MLPDeepProjector,
    MLPProjector,
)

PyTree = Any


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach()
        if str(getattr(t, "dtype", "")) == "torch.bfloat16":
            return t.float().numpy()
        return t.numpy()
    return np.asarray(t)


def _sub(state: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    p = prefix + "." if prefix else ""
    return {k[len(p):]: v for k, v in state.items() if k.startswith(p)}


def _linear(state: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(_np(state[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in state:
        out["bias"] = _np(state[f"{prefix}.bias"])
    return out


def _layernorm(state: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(state[f"{prefix}.weight"]), "bias": _np(state[f"{prefix}.bias"])}


def _mlp_projector(state: Mapping[str, Any], module) -> Dict[str, Any]:
    """LinearProjector / MLPProjector family from a torch projector state dict."""
    if isinstance(module, LinearProjector):
        out: Dict[str, Any] = {"projector": _linear(state, "projector")}
        if module.pre_proj_layernorm:
            out["layernorm"] = _layernorm(state, "layernorm")
        return out
    if isinstance(module, (MLPProjector, MLPDeepProjector, FusedMLPProjector)):
        # torch Sequential: Linear at even indices (GELUs between)
        lin_idxs = sorted({int(k.split(".")[1]) for k in state if k.startswith("projector.") and k.endswith(".weight")})
        out = {"projector": {str(i): _linear(state, f"projector.{t}") for i, t in enumerate(lin_idxs)}}
        if module.pre_proj_layernorm:
            out["layernorm"] = _layernorm(state, "layernorm")
        return out
    if isinstance(module, Identity):
        return {}
    raise NotImplementedError(type(module))


def convert_projector(module, state: Mapping[str, Any]) -> PyTree:
    """One per-encoder projector torch state dict -> our pytree."""
    if isinstance(module, (LinearProjector, MLPProjector, MLPDeepProjector, FusedMLPProjector, Identity)):
        return _mlp_projector(state, module)
    if isinstance(module, (AveragePooling3DProjector, AveragePoolingProjector)):
        # avg pooling has no params; inner "projector" is an mlp-family module
        return {"projector": _mlp_projector(_sub(state, "projector"), module.projector)}
    if isinstance(module, Convolutional3DProjector):
        return {
            # torch Sequential: [Conv3d, AdaptiveAvgPool3d]
            "conv": {"kernel": _np(state["convolution_pooling.0.weight"]), "bias": _np(state["convolution_pooling.0.bias"])},
            "projector": _mlp_projector(_sub(state, "projector"), module.projector),
        }
    if isinstance(module, AttentivePooler):
        xa = _sub(state, "cross_attn")
        return {
            "query_tokens": _np(state["query_tokens"]),
            "cross_attn": {
                "norm1": _layernorm(xa, "norm1"),
                "norm2": _layernorm(xa, "norm2"),
                "xattn": {"q": _linear(xa, "xattn.q"), "kv": _linear(xa, "xattn.kv"), "proj": _linear(xa, "xattn.proj")},
                "mlp": {"fc1": _linear(xa, "mlp.fc1"), "fc2": _linear(xa, "mlp.fc2")},
            },
            "projector": _mlp_projector(_sub(state, "projector"), module.projector),
        }
    if isinstance(module, ConvolutionalProjector):
        # torch Sequential: [RegStage, AdaptiveAvgPool2d, RegStage]
        # (reference nn_utils.py:269-274); timm RegStage blocks named b1..bN
        def conv_bn(pre: str) -> Dict[str, Any]:
            return {
                "conv": {"kernel": _np(state[f"{pre}.conv.weight"])},
                "bn": _layernorm(state, f"{pre}.bn"),
            }

        def reg_block(pre: str) -> Dict[str, Any]:
            blk = {
                "conv1": conv_bn(f"{pre}.conv1"),
                "conv2": conv_bn(f"{pre}.conv2"),
                "se": {
                    "fc1": {"kernel": _np(state[f"{pre}.se.fc1.weight"]), "bias": _np(state[f"{pre}.se.fc1.bias"])},
                    "fc2": {"kernel": _np(state[f"{pre}.se.fc2.weight"]), "bias": _np(state[f"{pre}.se.fc2.bias"])},
                },
                "conv3": conv_bn(f"{pre}.conv3"),
            }
            if f"{pre}.downsample.conv.weight" in state:
                blk["downsample"] = conv_bn(f"{pre}.downsample")
            return blk

        out: Dict[str, Any] = {}
        for stage, seq_idx in (("stage1", 0), ("stage2", 2)):
            for i in range(module.block_depth):
                out[f"{stage}_{i}"] = reg_block(f"convolution_pooling.{seq_idx}.b{i + 1}")
        out["projector"] = _mlp_projector(_sub(state, "projector"), module.projector)
        return out
    raise NotImplementedError(type(module))


def convert_fusion(module, state: Mapping[str, Any]) -> PyTree:
    if module is None or not state:
        return {}
    if isinstance(module, CrossAttentionAdapterLearnableQuery):
        d = module.embed_dim
        in_proj_bias = _np(state["attention.in_proj_bias"]) if "attention.in_proj_bias" in state else np.zeros(3 * d, np.float32)
        return {
            "Q": _np(state["Q"]),
            "attention": {
                "q_proj": {"kernel": np.ascontiguousarray(_np(state["attention.q_proj_weight"]).T), "bias": in_proj_bias[:d]},
                "k_proj": {"kernel": np.ascontiguousarray(_np(state["attention.k_proj_weight"]).T), "bias": in_proj_bias[d : 2 * d]},
                "v_proj": {"kernel": np.ascontiguousarray(_np(state["attention.v_proj_weight"]).T), "bias": in_proj_bias[2 * d :]},
                "out_proj": _linear(state, "attention.out_proj"),
            },
            **({"pe": _np(state["pe"])} if "pe" in state else {}),
        }
    if isinstance(module, ScalarAdapter):
        return {"scalar": _np(state["scalar"])}
    if isinstance(module, LinearProjector):  # concat_channel[_ln]
        # the reference wraps concat_channel_ln as Sequential(LayerNorm, LinearProjector)
        if "0.weight" in state:  # Sequential form
            out = {"layernorm": {"scale": _np(state["0.weight"]), "bias": _np(state["0.bias"])}}
            out["projector"] = _linear(state, "1.projector")
            return out
        return _mlp_projector(state, module)
    if isinstance(module, MLPProjector):  # query_mlp
        return _mlp_projector(state, module)
    raise NotImplementedError(type(module))


def migrate_legacy_keys(model_state: Dict[str, Any]) -> Dict[str, Any]:
    """projector -> projectors['0.*'], adapter -> feature_fusion (reference merv.py:264-276)."""
    out = dict(model_state)
    if "projector" in out and "projectors" not in out:
        out["projectors"] = {"0." + k: v for k, v in out.pop("projector").items()}
    if "adapter" in out and "feature_fusion" not in out:
        out["feature_fusion"] = out.pop("adapter")
    return out


def import_merv_checkpoint(
    model,
    checkpoint: Any,
    param_dtype: Any = jnp.float32,
    llm_param_dtype: Any = jnp.bfloat16,
) -> Dict[str, PyTree]:
    """Reference torch checkpoint -> partial params {projectors, feature_fusion[, llm_backbone]}.

    ``checkpoint`` is a path to a ``.pt`` file or an already-loaded dict with a
    ``"model"`` entry (reference layout).
    """
    if not isinstance(checkpoint, dict):
        import torch

        checkpoint = torch.load(checkpoint, map_location="cpu", weights_only=False)
    model_state = migrate_legacy_keys(checkpoint["model"] if "model" in checkpoint else checkpoint)

    out: Dict[str, PyTree] = {}
    proj_state = model_state["projectors"]
    out["projectors"] = {
        str(i): convert_projector(p, _sub(proj_state, str(i)))
        for i, p in enumerate(model.projectors)
    }
    if model.feature_fusion is not None and "feature_fusion" in model_state:
        out["feature_fusion"] = convert_fusion(model.feature_fusion, model_state["feature_fusion"])
    else:
        out["feature_fusion"] = {}

    if "llm_backbone" in model_state:
        from merv_tpu.models.backbones.llm.hf_import import import_llama_state_dict

        llm_state = {k.removeprefix("llm."): v for k, v in model_state["llm_backbone"].items()}
        out["llm_backbone"] = import_llama_state_dict(
            model.llm_backbone.decoder_config, llm_state, param_dtype=llm_param_dtype
        )

    def cast(tree):
        return jax.tree_util.tree_map(lambda x: jnp.asarray(x, param_dtype), tree)

    out["projectors"] = cast(out["projectors"])
    out["feature_fusion"] = cast(out["feature_fusion"])
    return out
