"""Reference-format checkpoint import: torch state dicts -> functional pytrees.

Golden parity: torch modules arranged like the reference's (Sequential MLP
projectors, MultiheadAttention fusion) produce state dicts that must load and
compute identically here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch


@pytest.fixture(autouse=True)
def _restore_vit_config():
    # _make_towers patches class-level vit_config; restore after each test
    from merv_tpu.models.backbones.video import DinoV2VideoBackbone, SiglipVideoBackbone

    saved = {cls: cls.__dict__.get("vit_config") for cls in (DinoV2VideoBackbone, SiglipVideoBackbone)}
    yield
    for cls, prop in saved.items():
        if prop is None:
            if "vit_config" in cls.__dict__:
                delattr(cls, "vit_config")
        else:
            setattr(cls, "vit_config", prop)

from merv_tpu.models.ckpt_import import (
    convert_fusion,
    convert_projector,
    import_merv_checkpoint,
    migrate_legacy_keys,
)
from merv_tpu.nn.fusion import CrossAttentionAdapterLearnableQuery
from merv_tpu.nn.projectors import AveragePooling3DProjector, LinearProjector, MLPProjector

KEY = jax.random.PRNGKey(0)


def test_convert_linear_projector():
    ref = torch.nn.Linear(12, 20)
    state = {f"projector.{k}": v for k, v in ref.state_dict().items()}
    module = LinearProjector(12, 20)
    params = convert_projector(module, state)
    x = np.random.randn(3, 12).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(module(params, jnp.asarray(x))),
        ref(torch.from_numpy(x)).detach().numpy(),
        atol=1e-5,
    )


def test_convert_mlp_projector_sequential_indices():
    ref = torch.nn.Sequential(torch.nn.Linear(8, 16), torch.nn.GELU(), torch.nn.Linear(16, 16))
    state = {f"projector.{k}": v for k, v in ref.state_dict().items()}
    module = MLPProjector(8, 16)
    params = convert_projector(module, state)
    x = np.random.randn(2, 8).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(module(params, jnp.asarray(x))), ref(torch.from_numpy(x)).detach().numpy(), atol=1e-5
    )


def test_convert_avg3d_projector():
    """Reference AveragePooling3DProjector state dict: pool has no params,
    inner mlp lives under 'projector.projector.*'."""
    inner = torch.nn.Linear(10, 6)
    state = {f"projector.projector.{k}": v for k, v in inner.state_dict().items()}
    module = AveragePooling3DProjector(10, 6, output_frames=2, output_size=2, mlp_type="linear")
    params = convert_projector(module, state)
    x = np.random.randn(1, 4, 16, 10).astype(np.float32)
    out = module(params, jnp.asarray(x))
    assert out.shape == (1, 8, 6)
    # golden: torch pool + linear
    xt = torch.from_numpy(x.reshape(1, 4, 4, 4, 10).transpose(0, 4, 1, 2, 3))
    pooled = torch.nn.AdaptiveAvgPool3d((2, 2, 2))(xt).permute(0, 2, 3, 4, 1).reshape(1, 8, 10)
    np.testing.assert_allclose(np.asarray(out), inner(pooled).detach().numpy(), atol=1e-5)


def test_convert_fusion_mha():
    d, llm, T, E = 24, 8, 4, 3
    mha = torch.nn.MultiheadAttention(d, 1, batch_first=True, kdim=llm, vdim=llm)
    state = {f"attention.{k}": v for k, v in mha.state_dict().items()}
    state["Q"] = torch.randn(1, d)
    module = CrossAttentionAdapterLearnableQuery(embed_dim=d, llm_dim=llm, token_length=T, averagetoken=True, num_encoder=E)
    params = convert_fusion(module, state)

    rng = np.random.RandomState(0)
    V_np = [rng.randn(2, T, llm).astype(np.float32) for _ in range(E)]
    fused, weights = module(params, [jnp.asarray(v) for v in V_np])

    Q = state["Q"].repeat(2, 1).unsqueeze(1)
    Vt = torch.stack([torch.from_numpy(v) for v in V_np], 1)
    with torch.no_grad():
        _, w_ref = mha(Q, Vt.mean(2), Vt.mean(2))
        fused_ref = torch.bmm(w_ref, Vt.reshape(2, E, T * llm)).reshape(2, T, llm)
    np.testing.assert_allclose(np.asarray(weights), w_ref[:, 0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused), fused_ref.numpy(), atol=1e-5)


def test_migrate_legacy_keys():
    state = {"projector": {"projector.weight": 1}, "adapter": {"Q": 2}, "llm_backbone": {}}
    out = migrate_legacy_keys(state)
    assert "projectors" in out and "0.projector.weight" in out["projectors"]
    assert "feature_fusion" in out and out["feature_fusion"]["Q"] == 2


def test_import_merv_checkpoint_end_to_end():
    """Full reference-layout checkpoint dict -> params usable by the model."""
    from merv_tpu.models.backbones.llm.base_llm import tiny_llm_backbone
    from merv_tpu.models.vidlms import MERV
    from tests.test_merv_vidlm import _make_towers  # tiny towers fixture helper

    towers = _make_towers()
    model = MERV(
        "import-test", towers, tiny_llm_backbone(),
        arch_specifier="no-align+3davg+linear", feature_fusion="cross_attention_avg_lq",
        projector_token_length=4, visual_feature_length=16, text_embedding_dim=24,
    )

    proj_state = {}
    torch_projs = []
    for i, vb in enumerate(towers):
        lin = torch.nn.Linear(vb.embed_dim, model.llm_backbone.embed_dim)
        torch_projs.append(lin)
        for k, v in lin.state_dict().items():
            proj_state[f"{i}.projector.projector.{k}"] = v

    mha = torch.nn.MultiheadAttention(24, 1, batch_first=True, kdim=64, vdim=64)
    fusion_state = {f"attention.{k}": v for k, v in mha.state_dict().items()}
    fusion_state["Q"] = torch.randn(1, 24)

    ckpt = {"model": {"projectors": proj_state, "feature_fusion": fusion_state}}
    restored = import_merv_checkpoint(model, ckpt)
    assert set(restored["projectors"].keys()) == {"0", "1"}

    params = model.init(KEY)
    params.update({k: v for k, v in restored.items() if v})
    input_ids = jnp.full((1, 6), 5, jnp.int32).at[:, 0].set(1)
    out = model.forward(
        params, input_ids, jnp.ones((1, 6), jnp.int32),
        [jnp.ones((1, *vb.default_video_resolution), jnp.float32) for vb in towers],
    )
    assert out["logits"].shape[1] == 6 + 16
