"""SigLIP pooled (MAP-head) variant parity.

The reference's pooled SigLIP ids (``siglip-vit-b16-224px`` etc.) keep timm's
default forward: full depth + final norm + AttentionPoolLatent, one pooled
token per frame (reference siglip.py:47-58, num_patches == num_frames
``:163-169``). HF's ``SiglipMultiheadAttentionPoolingHead`` computes the
identical function (latent probe -> MHA -> x + mlp(norm(x)) -> token 0) with
packed in_proj weights and tanh-GELU, so it serves as the torch golden here;
the timm-naming import path is covered by mapping checks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merv_tpu.models.backbones.video.siglip import SiglipVideoBackbone
from merv_tpu.models.backbones.video.vision_import import import_vision_state_dict
from merv_tpu.models.backbones.video.vit import VisionTransformer, tiny_vit_config

torch = pytest.importorskip("torch")


def _tiny_hf_siglip():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    cfg = SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3, num_attention_heads=4,
        image_size=32, patch_size=8,
    )
    torch.manual_seed(2)
    return SiglipVisionModel(cfg).eval()


def _map_hf_head(params, model):
    """HF head.* -> our attn_pool param tree (packed in_proj split to q/kv)."""
    head = model.vision_model.head
    D = head.probe.shape[-1]
    w = head.attention.in_proj_weight.detach().numpy()  # [3D, D] rows q,k,v
    b = head.attention.in_proj_bias.detach().numpy()
    pool = {
        "latent": head.probe.detach().numpy()[0],
        "q": {"kernel": np.ascontiguousarray(w[:D].T), "bias": b[:D]},
        "kv": {
            "kernel": np.ascontiguousarray(np.concatenate([w[D : 2 * D], w[2 * D :]], 0).T),
            "bias": np.concatenate([b[D : 2 * D], b[2 * D :]]),
        },
        "proj": {
            "kernel": np.ascontiguousarray(head.attention.out_proj.weight.detach().numpy().T),
            "bias": head.attention.out_proj.bias.detach().numpy(),
        },
        "norm": {"scale": head.layernorm.weight.detach().numpy(), "bias": head.layernorm.bias.detach().numpy()},
        "mlp": {
            "fc1": {"kernel": np.ascontiguousarray(head.mlp.fc1.weight.detach().numpy().T),
                    "bias": head.mlp.fc1.bias.detach().numpy()},
            "fc2": {"kernel": np.ascontiguousarray(head.mlp.fc2.weight.detach().numpy().T),
                    "bias": head.mlp.fc2.bias.detach().numpy()},
        },
    }
    params = dict(params)
    params["attn_pool"] = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), pool)
    return params


def test_attn_pool_matches_hf_pooler():
    model = _tiny_hf_siglip()
    cfg = tiny_vit_config(
        num_cls_tokens=0, pos_embed_includes_prefix=False, act="gelu_tanh",
        attn_pool=True, attn_pool_heads=4, attn_pool_mlp_ratio=2.0, attn_pool_act="gelu_tanh",
    )
    params = import_vision_state_dict(cfg, model.state_dict(), require_attn_pool=False)
    params = _map_hf_head(params, model)
    vit = VisionTransformer(cfg)

    px = np.random.RandomState(4).randn(3, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = model(pixel_values=torch.tensor(px)).pooler_output.numpy()
    got = np.asarray(vit(params, jnp.asarray(px), apply_attn_pool=True))
    assert got.shape == want.shape == (3, 64)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_timm_attn_pool_import_naming():
    """timm state-dict naming (attn_pool.latent/q/kv/proj/norm/mlp) maps into
    the pytree with the right shapes."""
    cfg = tiny_vit_config(
        num_cls_tokens=0, pos_embed_includes_prefix=False, act="gelu_tanh",
        attn_pool=True, attn_pool_heads=4, attn_pool_mlp_ratio=2.0,
    )
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(3)
    body = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3, num_attention_heads=4,
        image_size=32, patch_size=8,
    )).eval()
    state = {k: v for k, v in body.state_dict().items() if not k.startswith("vision_model.head")}
    D, hidden = 64, 128
    state.update({
        "attn_pool.latent": torch.randn(1, 1, D),
        "attn_pool.q.weight": torch.randn(D, D), "attn_pool.q.bias": torch.randn(D),
        "attn_pool.kv.weight": torch.randn(2 * D, D), "attn_pool.kv.bias": torch.randn(2 * D),
        "attn_pool.proj.weight": torch.randn(D, D), "attn_pool.proj.bias": torch.randn(D),
        "attn_pool.norm.weight": torch.ones(D), "attn_pool.norm.bias": torch.zeros(D),
        "attn_pool.mlp.fc1.weight": torch.randn(hidden, D), "attn_pool.mlp.fc1.bias": torch.randn(hidden),
        "attn_pool.mlp.fc2.weight": torch.randn(D, hidden), "attn_pool.mlp.fc2.bias": torch.randn(D),
    })
    params = import_vision_state_dict(cfg, state)
    init = VisionTransformer(cfg).init(jax.random.PRNGKey(0))
    got = {k: v.shape for k, v in jax.tree_util.tree_leaves_with_path(params["attn_pool"])}
    want = {k: v.shape for k, v in jax.tree_util.tree_leaves_with_path(init["attn_pool"])}
    assert got == want
    out = VisionTransformer(cfg)(params, jnp.zeros((2, 3, 32, 32)), apply_attn_pool=True)
    assert out.shape == (2, 64)


def test_siglip_pooled_backbone_shapes(monkeypatch):
    tiny = tiny_vit_config(
        num_cls_tokens=0, pos_embed_includes_prefix=False, act="gelu_tanh",
        attn_pool=True, attn_pool_heads=4, attn_pool_mlp_ratio=2.0,
    )
    monkeypatch.setattr(
        SiglipVideoBackbone, "vit_config", property(lambda self: dataclasses.replace(tiny))
    )
    bb = SiglipVideoBackbone("siglip-vit-b16-224px", "resize-naive", default_image_size=32, num_frames=4)
    assert bb.class_token and bb.num_patches == 4 and bb.spatial_resolution == 1
    params = bb.init(jax.random.PRNGKey(0))
    out = bb(params, jnp.zeros((2, 4, 3, 32, 32)))
    assert out.shape == (2, 4, 64)


def test_siglip_inconsistent_variants_still_refused():
    with pytest.raises(NotImplementedError):
        SiglipVideoBackbone("siglip-vit-b16-224px-all-tokens", "resize-naive")
    with pytest.raises(NotImplementedError):
        SiglipVideoBackbone("siglip-vit-b16-224px-classemb-at-first", "resize-naive")
