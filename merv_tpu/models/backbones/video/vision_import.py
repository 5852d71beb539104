"""Vision-tower checkpoint import: timm / HF state dicts -> VisionTransformer pytree.

The reference loads towers via ``timm.create_model(..., pretrained=True)``
(DINOv2/SigLIP, reference ``dinov2_video.py:40-45``, ``siglip.py:53-58``),
``VivitModel.from_pretrained`` (``vivit.py:42-47``) and
``LanguageBindVideo.from_pretrained`` (``languagebind/__init__.py:60-63``).
Here the same checkpoints (as state dicts / safetensors) map onto the single
functional :class:`VisionTransformer`.

Handles the three naming families (timm, HF ViT-style, HF CLIP-style), fused
qkv splitting, Conv2d/Conv3d patch kernels -> reshape-matmul layout, and
position-embedding grid resampling (bicubic antialias via torch, import-time
only — matching timm's ``resample_abs_pos_embed`` which the reference hits by
creating DINOv2 at 224px from the 518px checkpoint).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from merv_tpu.models.backbones.video.vit import ViTConfig

PyTree = Any


def _to_numpy(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    if hasattr(t, "detach"):
        t = t.detach()
        if str(t.dtype) == "torch.bfloat16":
            return t.float().numpy().astype(np.float32)
        return t.numpy()
    return np.asarray(t)


def _resample_pos_embed(pos: np.ndarray, src_grid: int, dst_grid: int) -> np.ndarray:
    """Bicubic-antialias resample of a [G*G, D] grid to [g*g, D] (timm-equivalent)."""
    if src_grid == dst_grid:
        return pos
    import torch
    import torch.nn.functional as TF

    D = pos.shape[-1]
    t = torch.from_numpy(pos.astype(np.float32)).reshape(1, src_grid, src_grid, D).permute(0, 3, 1, 2)
    t = TF.interpolate(t, size=(dst_grid, dst_grid), mode="bicubic", antialias=True)
    return t.permute(0, 2, 3, 1).reshape(dst_grid * dst_grid, D).numpy()


def _conv2d_to_kernel(w: np.ndarray) -> np.ndarray:
    """[D, C, p, p] conv weight -> [(p*p*C), D] matmul kernel (patchify layout)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0]))


def _conv3d_to_kernel(w: np.ndarray) -> np.ndarray:
    """[D, C, t, p, p] -> [(t*p*p*C), D]."""
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0).reshape(-1, w.shape[0]))


def _ln(state: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _to_numpy(state[f"{prefix}.weight"]), "bias": _to_numpy(state[f"{prefix}.bias"])}


def _linear(state: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    p = {"kernel": np.ascontiguousarray(_to_numpy(state[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in state:
        p["bias"] = _to_numpy(state[f"{prefix}.bias"])
    return p


def _split_qkv(state: Mapping[str, Any], prefix: str, dim: int) -> Dict[str, Dict[str, np.ndarray]]:
    w = _to_numpy(state[f"{prefix}.weight"])  # [3D, D]
    parts = {"q_proj": w[:dim], "k_proj": w[dim : 2 * dim], "v_proj": w[2 * dim :]}
    out = {k: {"kernel": np.ascontiguousarray(v.T)} for k, v in parts.items()}
    if f"{prefix}.bias" in state:
        b = _to_numpy(state[f"{prefix}.bias"])
        for i, k in enumerate(["q_proj", "k_proj", "v_proj"]):
            out[k]["bias"] = b[i * dim : (i + 1) * dim]
    return out


def _detect_naming(state: Mapping[str, Any]) -> str:
    keys = list(state.keys())
    if any(k.startswith("blocks.0.") or k.endswith("patch_embed.proj.weight") for k in keys):
        return "timm"
    if any(".self_attn.q_proj." in k for k in keys):
        return "hf_clip"
    if any(".attention.attention.query." in k for k in keys):
        return "hf_vit"
    raise ValueError(f"Unrecognized vision state dict naming; sample keys: {keys[:8]}")


def _strip_prefix(state: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove leading 'vision_model.'/'vivit.'/'dinov2.' wrappers if present."""
    out = {}
    for k, v in state.items():
        for pre in ("vision_model.", "vivit.", "dinov2.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        out[k] = v
    return out


def import_vision_state_dict(
    cfg: ViTConfig,
    raw_state: Mapping[str, Any],
    *,
    param_dtype: Any = jnp.float32,
    require_attn_pool: bool = True,
) -> PyTree:
    """``require_attn_pool=False`` permits importing just the transformer body
    when ``cfg.attn_pool`` is set (caller grafts a differently-named head —
    e.g. HF's ``head.*`` packed in_proj layout — afterwards)."""
    state = _strip_prefix(raw_state)
    naming = _detect_naming(state)
    D = cfg.hidden_size
    L = cfg.num_layers

    params: Dict[str, Any] = {}

    if naming == "timm":
        w = _to_numpy(state["patch_embed.proj.weight"])
        params["patch_embed"] = {"kernel": _conv2d_to_kernel(w)}
        if cfg.patch_bias:
            params["patch_embed"]["bias"] = _to_numpy(state["patch_embed.proj.bias"])
        pos = _to_numpy(state["pos_embed"])[0]  # [N(+1), D]
        if "cls_token" in state:
            params["cls_token"] = _to_numpy(state["cls_token"])[0]
        if "reg_token" in state:
            params["register_tokens"] = _to_numpy(state["reg_token"])[0]
        params["final_norm"] = _ln(state, "norm")

        def layer(i: int) -> Dict[str, Any]:
            p = {
                "norm1": _ln(state, f"blocks.{i}.norm1"),
                "attn": {
                    **_split_qkv(state, f"blocks.{i}.attn.qkv", D),
                    "o_proj": _linear(state, f"blocks.{i}.attn.proj"),
                },
                "norm2": _ln(state, f"blocks.{i}.norm2"),
                "mlp": {
                    "fc1": _linear(state, f"blocks.{i}.mlp.fc1"),
                    "fc2": _linear(state, f"blocks.{i}.mlp.fc2"),
                },
            }
            if cfg.use_layerscale:
                p["ls1"] = {"gamma": _to_numpy(state[f"blocks.{i}.ls1.gamma"])}
                p["ls2"] = {"gamma": _to_numpy(state[f"blocks.{i}.ls2.gamma"])}
            return p

    elif naming == "hf_clip":
        # CLIP / SigLIP / LanguageBind HF layout
        w = _to_numpy(state["embeddings.patch_embedding.weight"])
        params["patch_embed"] = {"kernel": _conv2d_to_kernel(w)}
        if cfg.patch_bias:
            params["patch_embed"]["bias"] = _to_numpy(state["embeddings.patch_embedding.bias"])
        pos = _to_numpy(state["embeddings.position_embedding.weight"])
        if "embeddings.class_embedding" in state:
            params["cls_token"] = _to_numpy(state["embeddings.class_embedding"]).reshape(1, D)
        if "pre_layrnorm.weight" in state:  # LanguageBind keeps CLIP's typo
            params["pre_norm"] = _ln(state, "pre_layrnorm")
        elif "pre_layernorm.weight" in state:
            params["pre_norm"] = _ln(state, "pre_layernorm")
        params["final_norm"] = _ln(state, "post_layernorm")

        def layer(i: int) -> Dict[str, Any]:
            pre = f"encoder.layers.{i}"
            p = {
                "norm1": _ln(state, f"{pre}.layer_norm1"),
                "attn": {
                    "q_proj": _linear(state, f"{pre}.self_attn.q_proj"),
                    "k_proj": _linear(state, f"{pre}.self_attn.k_proj"),
                    "v_proj": _linear(state, f"{pre}.self_attn.v_proj"),
                    "o_proj": _linear(state, f"{pre}.self_attn.out_proj"),
                },
                "norm2": _ln(state, f"{pre}.layer_norm2"),
                "mlp": {
                    "fc1": _linear(state, f"{pre}.mlp.fc1"),
                    "fc2": _linear(state, f"{pre}.mlp.fc2"),
                },
            }
            if cfg.temporal_attn:
                p["temporal_embedding"] = _to_numpy(state[f"{pre}.temporal_embedding"])[0]
                p["t_norm"] = _ln(state, f"{pre}.temporal_layer_norm1")
                p["t_attn"] = {
                    "q_proj": _linear(state, f"{pre}.temporal_attn.q_proj"),
                    "k_proj": _linear(state, f"{pre}.temporal_attn.k_proj"),
                    "v_proj": _linear(state, f"{pre}.temporal_attn.v_proj"),
                    "o_proj": _linear(state, f"{pre}.temporal_attn.out_proj"),
                }
            return p

    else:  # hf_vit (Dinov2 / ViViT style)
        projw = _to_numpy(state["embeddings.patch_embeddings.projection.weight"])
        if projw.ndim == 5:
            params["patch_embed"] = {"kernel": _conv3d_to_kernel(projw)}
        else:
            params["patch_embed"] = {"kernel": _conv2d_to_kernel(projw)}
        if cfg.patch_bias:
            params["patch_embed"]["bias"] = _to_numpy(state["embeddings.patch_embeddings.projection.bias"])
        pos = _to_numpy(state["embeddings.position_embeddings"])[0]
        if "embeddings.cls_token" in state:
            params["cls_token"] = _to_numpy(state["embeddings.cls_token"])[0]
        if "embeddings.register_tokens" in state:
            params["register_tokens"] = _to_numpy(state["embeddings.register_tokens"])[0]
        params["final_norm"] = _ln(state, "layernorm")

        def layer(i: int) -> Dict[str, Any]:
            pre = f"encoder.layer.{i}"
            if f"{pre}.norm1.weight" in state:  # dinov2 style
                n1, n2 = _ln(state, f"{pre}.norm1"), _ln(state, f"{pre}.norm2")
                fc1 = _linear(state, f"{pre}.mlp.fc1")
                fc2 = _linear(state, f"{pre}.mlp.fc2")
            else:  # vit/vivit style
                n1, n2 = _ln(state, f"{pre}.layernorm_before"), _ln(state, f"{pre}.layernorm_after")
                fc1 = _linear(state, f"{pre}.intermediate.dense")
                fc2 = _linear(state, f"{pre}.output.dense")
            p = {
                "norm1": n1,
                "attn": {
                    "q_proj": _linear(state, f"{pre}.attention.attention.query"),
                    "k_proj": _linear(state, f"{pre}.attention.attention.key"),
                    "v_proj": _linear(state, f"{pre}.attention.attention.value"),
                    "o_proj": _linear(state, f"{pre}.attention.output.dense"),
                },
                "norm2": n2,
                "mlp": {"fc1": fc1, "fc2": fc2},
            }
            if cfg.use_layerscale:
                p["ls1"] = {"gamma": _to_numpy(state[f"{pre}.layer_scale1.lambda1"])}
                p["ls2"] = {"gamma": _to_numpy(state[f"{pre}.layer_scale2.lambda1"])}
            return p

    # --- position embedding normalization -----------------------------------------
    # Split prefix rows, resample the patch grid to the config resolution, and
    # restore the convention the config expects (zero prefix row == "no pos on
    # cls", i.e. timm's no_embed_class semantics).
    n_prefix_rows = pos.shape[0] - int(round(np.sqrt(pos.shape[0]))) ** 2
    if n_prefix_rows > 0:
        prefix_pos, grid_pos = pos[:n_prefix_rows], pos[n_prefix_rows:]
    else:
        prefix_pos, grid_pos = pos[:0], pos
    src_grid = int(round(np.sqrt(grid_pos.shape[0])))
    if cfg.tubelet_t:
        # ViViT: rows are (T/t)*g*g + cls; temporal axis not resampled
        grid_pos = pos[n_prefix_rows:]
        assert cfg.image_size // cfg.patch_size * cfg.image_size // cfg.patch_size * (
            grid_pos.shape[0] // (cfg.image_size // cfg.patch_size) ** 2
        ) == grid_pos.shape[0]
    elif src_grid != cfg.grid_size:
        grid_pos = _resample_pos_embed(grid_pos, src_grid, cfg.grid_size)

    if cfg.pos_embed_includes_prefix and cfg.num_cls_tokens:
        if n_prefix_rows >= cfg.num_cls_tokens:
            pos_final = np.concatenate([prefix_pos[: cfg.num_cls_tokens], grid_pos], axis=0)
        else:
            # checkpoint has no cls row (timm no_embed_class): zero row == add nothing
            pos_final = np.concatenate([np.zeros((cfg.num_cls_tokens, D), grid_pos.dtype), grid_pos], axis=0)
    else:
        pos_final = grid_pos
    params["pos_embed"] = pos_final

    # timm MAP attention-pool head (SigLIP pooled variants; naming
    # attn_pool.latent/q/kv/proj/norm/mlp regardless of body naming family)
    if cfg.attn_pool and require_attn_pool and "attn_pool.latent" not in state:
        # fail at import time, not as an opaque KeyError deep in forward
        raise KeyError(
            "config requires the MAP attention-pool head but the checkpoint has "
            "no attn_pool.* keys — pooled-variant weights must include the head "
            "(or pass require_attn_pool=False and graft the head explicitly)"
        )
    if cfg.attn_pool and "attn_pool.latent" in state:
        params["attn_pool"] = {
            "latent": _to_numpy(state["attn_pool.latent"])[0],
            "q": _linear(state, "attn_pool.q"),
            "kv": _linear(state, "attn_pool.kv"),
            "proj": _linear(state, "attn_pool.proj"),
            "norm": _ln(state, "attn_pool.norm"),
            "mlp": {
                "fc1": _linear(state, "attn_pool.mlp.fc1"),
                "fc2": _linear(state, "attn_pool.mlp.fc2"),
            },
        }

    params["layers"] = _stack_layers([layer(i) for i in range(L)])
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype=param_dtype), params)


def _stack_layers(layers: list) -> PyTree:
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *layers)


# ---------------------------------------------------------------------------
# Pretrained tower resolution (local-first; network only when opted in)
# ---------------------------------------------------------------------------


def load_pretrained_tower(backbone: Any) -> PyTree:
    """Resolve + import pretrained weights for a VideoBackbone instance.

    Resolution order:
    1. ``$MERV_TPU_TOWER_DIR/{identifier}.safetensors`` — pre-exported local
       weights (air-gapped deployments);
    2. timm (DINOv2 / SigLIP) or HF transformers (ViViT) checkpoints from the
       local cache; network fetch only when ``MERV_TPU_ONLINE=1``.

    Raises on failure — callers decide whether random init is acceptable.
    """
    import os
    from pathlib import Path

    ident = backbone.identifier
    tower_dir = os.environ.get("MERV_TPU_TOWER_DIR")
    if tower_dir:
        f = Path(tower_dir) / f"{ident}.safetensors"
        if f.exists():
            from safetensors.numpy import load_file

            return backbone.load_state_dict(load_file(str(f)))

    online = os.environ.get("MERV_TPU_ONLINE", "0") == "1"
    if not online:
        os.environ.setdefault("HF_HUB_OFFLINE", "1")

    if hasattr(backbone, "timm_path_or_url"):
        import timm

        model = timm.create_model(backbone.timm_path_or_url, pretrained=True)
        return backbone.load_state_dict(model.state_dict())
    if hasattr(backbone, "huggingface_path_or_url"):  # ViViT
        from transformers import VivitModel

        model = VivitModel.from_pretrained(backbone.huggingface_path_or_url, local_files_only=not online)
        return backbone.load_state_dict(model.state_dict())
    if hasattr(backbone, "huggingface_path"):  # Hiera (original repo layout weights)
        return backbone.load_state_dict(extract_hiera_state(None, online))
    if "languagebind" in ident:  # LanguageBind: HF snapshot of the dual-tower ckpt
        return backbone.load_state_dict(extract_languagebind_state(None, online))
    raise FileNotFoundError(
        f"No pretrained source for {ident}: run scripts/export_towers.py to produce "
        f"$MERV_TPU_TOWER_DIR/{ident}.safetensors"
    )


# ---------------------------------------------------------------------------
# Torch-checkpoint extraction (shared with scripts/export_towers.py)
# ---------------------------------------------------------------------------


def to_numpy_state(state: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Torch/np state dict -> contiguous fp32/np arrays (safetensors-ready)."""
    out = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            v = v.detach()
            if str(v.dtype) == "torch.bfloat16":
                v = v.float()
            v = v.cpu().numpy()
        arr = np.asarray(v)
        if arr.dtype == np.float64:
            arr = arr.astype(np.float32)
        out[k] = np.ascontiguousarray(arr)
    return out


def load_torch_ckpt_file(path: Any) -> Dict[str, Any]:
    """torch.load + unwrap the usual nesting keys (model_state/state_dict/...)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("model_state", "state_dict", "model", "module"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    assert isinstance(obj, dict), f"unrecognized checkpoint structure in {path}"
    return obj


def load_snapshot_dir(path: Any) -> Dict[str, Any]:
    """Read every *.safetensors / pytorch_model*.bin in an HF snapshot dir."""
    import glob
    from pathlib import Path

    path = Path(path)
    state: Dict[str, Any] = {}
    st_files = sorted(glob.glob(str(path / "*.safetensors")))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            state.update(load_file(f))
        return state
    bin_files = sorted(glob.glob(str(path / "pytorch_model*.bin"))) or sorted(glob.glob(str(path / "*.pth")))
    assert bin_files, f"no weight files found under {path}"
    for f in bin_files:
        state.update(load_torch_ckpt_file(f))
    return state


def hf_cache_snapshot(repo_id: str):
    """Newest local snapshot dir for an HF repo, if cached."""
    import os
    from pathlib import Path

    cache = Path(os.environ.get("HF_HUB_CACHE", Path.home() / ".cache/huggingface/hub"))
    repo_dir = cache / f"models--{repo_id.replace('/', '--')}" / "snapshots"
    if not repo_dir.exists():
        return None
    snaps = sorted(repo_dir.iterdir(), key=lambda p: p.stat().st_mtime)
    return snaps[-1] if snaps else None


def extract_languagebind_state(source: Optional[str], online: bool) -> Dict[str, np.ndarray]:
    """LanguageBind_Video_merge ckpt -> ``vision_model.*`` keys only (the
    reference keeps ``.vision_model`` of the dual-tower CLIP checkpoint,
    reference ``languagebind/__init__.py:60-63``)."""
    from pathlib import Path

    if source:
        p = Path(source)
        raw = load_snapshot_dir(p) if p.is_dir() else load_torch_ckpt_file(p)
    else:
        snap = hf_cache_snapshot("LanguageBind/LanguageBind_Video_merge")
        if snap is None and online:
            from huggingface_hub import snapshot_download

            snap = Path(snapshot_download("LanguageBind/LanguageBind_Video_merge"))
        if snap is None:
            raise FileNotFoundError(
                "LanguageBind checkpoint not cached; pass a local snapshot/ckpt or set MERV_TPU_ONLINE=1"
            )
        raw = load_snapshot_dir(snap)
    state = {
        k: v
        for k, v in to_numpy_state(raw).items()
        if k.startswith("vision_model.") and not k.endswith("position_ids")
    }
    assert any(".temporal_attn." in k for k in state), "not a LanguageBind *video* checkpoint (no temporal_attn)"
    return state


def extract_hiera_state(source: Optional[str], online: bool) -> Dict[str, np.ndarray]:
    """Original-repo Hiera ``.pth`` (torch hub layout) -> flat state dict."""
    import glob
    import os
    from pathlib import Path

    if source:
        raw = load_torch_ckpt_file(Path(source))
    else:
        hub_dir = Path(os.environ.get("TORCH_HOME", Path.home() / ".cache/torch")) / "hub" / "checkpoints"
        cands = sorted(glob.glob(str(hub_dir / "*hiera_base_plus_16x224*"))) if hub_dir.exists() else []
        if cands:
            raw = load_torch_ckpt_file(Path(cands[-1]))
        elif online:
            import torch

            url = "https://dl.fbaipublicfiles.com/hiera/mae_k400/hiera_base_plus_16x224.pth"
            # weights_only matches load_torch_ckpt_file's hardening: never
            # unpickle arbitrary objects from a remotely served archive
            raw = torch.hub.load_state_dict_from_url(
                url, map_location="cpu", check_hash=False, weights_only=True
            )
            for key in ("model_state", "state_dict"):
                if isinstance(raw, dict) and key in raw:
                    raw = raw[key]
                    break
        else:
            raise FileNotFoundError(
                "Hiera checkpoint not cached; pass a local .pth or set MERV_TPU_ONLINE=1"
            )
    return {k: v for k, v in to_numpy_state(raw).items() if not k.startswith("head.")}
