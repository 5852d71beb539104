"""Hiera video backbone: unroll parity vs HF, shapes, clip grouping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merv_tpu.models.backbones.video.hiera import (
    HIERA_CONFIGS,
    HieraConfig,
    HieraModel,
    HieraVideoBackbone,
    _unroll,
)

KEY = jax.random.PRNGKey(0)

TINY = HieraConfig(input_size=(4, 32, 32), embed_dim=8, num_heads=1, stages=(1, 1, 1, 1), compute_dtype=jnp.float32)


def test_unroll_matches_hf_torch():
    """Our 3D unroll == HF transformers' dimension-generic unroll."""
    import torch
    from transformers.models.hiera.modeling_hiera import unroll as hf_unroll

    x = torch.randn(2, 2 * 8 * 8, 5)
    ref = hf_unroll(x, (4, 32, 32), (2, 4, 4), [[1, 2, 2]] * 3).numpy()
    ours = np.asarray(_unroll(jnp.asarray(x.numpy()), (2, 8, 8), [[1, 2, 2]] * 3))
    np.testing.assert_array_equal(ours, ref)


def test_tiny_hiera_forward():
    m = HieraModel(TINY)
    params = m.init(KEY)
    x = jnp.asarray(np.random.randn(2, 3, 4, 32, 32), jnp.float32)
    y = m(params, x)
    # tokens (2,8,8) -> q_pool 3x spatial/2 -> (2,1,1); dim 8*2^3 = 64
    assert y.shape == (2, 2, 64)
    assert np.all(np.isfinite(np.asarray(y)))


def test_layer_plan_structure():
    plan = HIERA_CONFIGS["hiera_base_plus_16x224"].layer_plan()
    assert len(plan) == 24
    # pooling at first layer of stages 1..3 (flat 2, 5, 21)
    assert [i for i, lp in enumerate(plan) if lp["q_stride"] > 1] == [2, 5, 21]
    # MU attention: stages 0,1 fully; stage 2 only its first (pooling) layer
    assert plan[0]["use_mu"] and plan[4]["use_mu"] and plan[5]["use_mu"]
    assert not plan[6]["use_mu"] and not plan[21]["use_mu"]
    assert plan[-1]["dim_out"] == 896


def test_backbone_metadata():
    bb = HieraVideoBackbone("hiera-base-plus-video", "resize-naive", num_frames=16)
    assert bb.embed_dim == 112 * 8
    # (16/2) * (56*56/64) = 8 * 49 = 392
    assert bb.num_patches == 392
    assert bb.spatial_resolution == 49
    assert bb.temporal_resolution == 8


def test_backbone_clip_grouping():
    bb = HieraVideoBackbone("hiera-base-plus-video", "resize-naive", num_frames=16)
    bb.hiera_config = TINY
    bb.num_frames = 4

    object.__setattr__  # no-op; HieraVideoBackbone isn't frozen
    video = jnp.asarray(np.random.randn(2, 4, 3, 32, 32), jnp.float32)
    params = bb.model.init(KEY)
    # bypass the 16-frame regroup for the tiny config: call the model directly
    feats = bb.model(params, video.transpose(0, 2, 1, 3, 4))
    assert feats.shape == (2, 2, 64)


def test_weight_import_roundtrip():
    """Import from a synthetic torch-layout state dict and check forward runs."""
    import torch

    from merv_tpu.models.backbones.video.hiera import import_hiera_state_dict

    cfg = TINY
    state = {}
    state["patch_embed.proj.weight"] = torch.randn(cfg.embed_dim, 3, *cfg.patch_kernel)
    state["patch_embed.proj.bias"] = torch.randn(cfg.embed_dim)
    t, h, w = cfg.tokens_shape
    state["pos_embed_spatial"] = torch.randn(1, h * w, cfg.embed_dim)
    state["pos_embed_temporal"] = torch.randn(1, t, cfg.embed_dim)
    for i, lp in enumerate(cfg.layer_plan()):
        d_in, d_out = lp["dim_in"], lp["dim_out"]
        hidden = int(d_out * cfg.mlp_ratio)
        state[f"blocks.{i}.norm1.weight"] = torch.ones(d_in)
        state[f"blocks.{i}.norm1.bias"] = torch.zeros(d_in)
        state[f"blocks.{i}.attn.qkv.weight"] = torch.randn(3 * d_out, d_in) * 0.02
        state[f"blocks.{i}.attn.qkv.bias"] = torch.zeros(3 * d_out)
        state[f"blocks.{i}.attn.proj.weight"] = torch.randn(d_out, d_out) * 0.02
        state[f"blocks.{i}.attn.proj.bias"] = torch.zeros(d_out)
        state[f"blocks.{i}.norm2.weight"] = torch.ones(d_out)
        state[f"blocks.{i}.norm2.bias"] = torch.zeros(d_out)
        state[f"blocks.{i}.mlp.fc1.weight"] = torch.randn(hidden, d_out) * 0.02
        state[f"blocks.{i}.mlp.fc1.bias"] = torch.zeros(hidden)
        state[f"blocks.{i}.mlp.fc2.weight"] = torch.randn(d_out, hidden) * 0.02
        state[f"blocks.{i}.mlp.fc2.bias"] = torch.zeros(d_out)
        if d_in != d_out:
            state[f"blocks.{i}.proj.weight"] = torch.randn(d_out, d_in) * 0.02
            state[f"blocks.{i}.proj.bias"] = torch.zeros(d_out)

    params = import_hiera_state_dict(cfg, state, param_dtype=jnp.float32)
    y = HieraModel(cfg)(params, jnp.zeros((1, 3, 4, 32, 32)))
    assert y.shape == (1, 2, 64)
