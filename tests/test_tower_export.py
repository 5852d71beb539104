"""Tower weight export pipeline: torch checkpoints -> safetensors -> JAX params.

Covers the acquisition path for the two families the hub can't serve directly
(LanguageBind's dual-tower checkpoint, Hiera's original-repo .pth) plus the
$MERV_TPU_TOWER_DIR resolution in load_pretrained_tower.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merv_tpu.models.backbones.video.languagebind import LangBindVideoBackbone
from merv_tpu.models.backbones.video.vision_import import (
    extract_hiera_state,
    extract_languagebind_state,
    load_pretrained_tower,
)
from merv_tpu.models.backbones.video.vit import ViTConfig

torch = pytest.importorskip("torch")

from tests.test_languagebind_parity import _tiny_torch_tower  # noqa: E402


def _tiny_lb_cfg() -> ViTConfig:
    return ViTConfig(
        image_size=32, patch_size=16, hidden_size=64, intermediate_size=128,
        num_layers=3, num_heads=4, num_cls_tokens=1,
        pos_embed_includes_prefix=True, act="quick_gelu", layer_norm_eps=1e-5,
        pre_norm=True, patch_bias=False, temporal_attn=True,
        temporal_frames=4, compute_dtype=jnp.float32,
    )


def _patched_backbone(monkeypatch) -> LangBindVideoBackbone:
    cfg = _tiny_lb_cfg()
    monkeypatch.setattr(
        LangBindVideoBackbone, "vit_config", property(lambda self: dataclasses.replace(cfg))
    )
    return LangBindVideoBackbone(
        "languagebind-video-noclass", "resize-naive", default_image_size=32, num_frames=4
    )


def _dual_tower_ckpt(tmp_path):
    """Fake LanguageBind_Video_merge layout: vision_model.* + text junk."""
    tower, _ = _tiny_torch_tower(num_frames=4, seed=5)
    sd = {f"vision_model.{k}": v for k, v in tower.state_dict().items()}
    sd["text_model.embeddings.token_embedding.weight"] = torch.zeros(7, 4)
    sd["vision_model.embeddings.position_ids"] = torch.arange(5)
    sd["logit_scale"] = torch.ones(())
    p = tmp_path / "languagebind_video_merge.pt"
    torch.save(sd, p)
    return tower, p


def test_extract_languagebind_filters_vision_keys(tmp_path, monkeypatch):
    tower, ckpt = _dual_tower_ckpt(tmp_path)
    state = extract_languagebind_state(str(ckpt), online=False)
    assert all(k.startswith("vision_model.") for k in state)
    assert not any(k.endswith("position_ids") for k in state)
    assert any(".temporal_attn." in k for k in state)

    # imported params must equal a direct import of the torch tower
    bb = _patched_backbone(monkeypatch)
    via_extract = bb.load_state_dict(state, param_dtype=jnp.float32)
    direct = bb.load_state_dict(tower.state_dict(), param_dtype=jnp.float32)
    for a, b in zip(jax.tree_util.tree_leaves(via_extract), jax.tree_util.tree_leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_extract_languagebind_rejects_image_ckpt(tmp_path):
    sd = {"vision_model.encoder.layers.0.self_attn.q_proj.weight": torch.zeros(4, 4)}
    p = tmp_path / "image_only.pt"
    torch.save(sd, p)
    with pytest.raises(AssertionError, match="temporal_attn"):
        extract_languagebind_state(str(p), online=False)


def test_tower_dir_resolution_roundtrip(tmp_path, monkeypatch):
    """export_towers writes {identifier}.safetensors with original torch keys;
    load_pretrained_tower resolves $MERV_TPU_TOWER_DIR first."""
    from safetensors.numpy import save_file

    tower, ckpt = _dual_tower_ckpt(tmp_path)
    state = extract_languagebind_state(str(ckpt), online=False)
    save_file(state, str(tmp_path / "languagebind-video-noclass.safetensors"))

    bb = _patched_backbone(monkeypatch)
    monkeypatch.setenv("MERV_TPU_TOWER_DIR", str(tmp_path))
    params = load_pretrained_tower(bb)
    direct = bb.load_state_dict(tower.state_dict())
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(direct)):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_extract_hiera_unwraps_model_state(tmp_path):
    inner = {
        "patch_embed.proj.weight": torch.zeros(8, 3, 3, 7, 7),
        "pos_embed_spatial": torch.zeros(1, 49, 8),
        "head.projection.weight": torch.zeros(400, 8),  # stripped
    }
    p = tmp_path / "hiera.pth"
    torch.save({"model_state": inner}, p)
    state = extract_hiera_state(str(p), online=False)
    assert "patch_embed.proj.weight" in state and "pos_embed_spatial" in state
    assert not any(k.startswith("head.") for k in state)
