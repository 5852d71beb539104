"""Projector + fusion module tests.

Golden-parity checks run against torch (CPU) implementations of the same
math — mirroring the reference's ``__main__`` shape-check drivers
(reference ``merv/util/nn_utils.py:540-582``) but with real assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from merv_tpu.nn.fusion import CrossAttentionAdapterLearnableQuery, ScalarAdapter
from merv_tpu.nn.projectors import (
    AttentivePooler,
    AveragePooling3DProjector,
    AveragePoolingProjector,
    Convolutional3DProjector,
    ConvolutionalProjector,
    FusedMLPProjector,
    LinearProjector,
    MLPDeepProjector,
    MLPProjector,
    adaptive_avg_pool_2d,
    adaptive_avg_pool_3d,
    adaptive_pool_matrix,
    get_mlp_projector,
)

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# Adaptive pooling: bitwise parity with torch AdaptiveAvgPool
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("in_size,out_size", [(14, 8), (16, 8), (16, 16), (32, 16), (7, 3), (5, 4)])
def test_adaptive_pool_matrix_matches_torch_1d(in_size, out_size):
    x = np.random.randn(2, 3, in_size).astype(np.float32)
    ref = torch.nn.AdaptiveAvgPool1d(out_size)(torch.from_numpy(x)).numpy()
    m = adaptive_pool_matrix(in_size, out_size)
    ours = np.einsum("bci,oi->bco", x, m)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_adaptive_pool_2d_matches_torch():
    x = np.random.randn(2, 14, 14, 5).astype(np.float32)
    ref = torch.nn.AdaptiveAvgPool2d((8, 8))(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(adaptive_avg_pool_2d(jnp.asarray(x), (8, 8))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_adaptive_pool_3d_matches_torch():
    x = np.random.randn(2, 16, 14, 14, 5).astype(np.float32)
    ref = torch.nn.AdaptiveAvgPool3d((8, 8, 8))(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    ours = np.asarray(adaptive_avg_pool_3d(jnp.asarray(x), (8, 8, 8))).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


# ---------------------------------------------------------------------------
# MLP projector family
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "cls,kw",
    [
        (LinearProjector, {}),
        (LinearProjector, {"pre_proj_layernorm": True}),
        (MLPProjector, {}),
        (MLPDeepProjector, {}),
        (FusedMLPProjector, {}),
    ],
)
def test_mlp_projectors_shapes(cls, kw):
    mod = cls(48, 64, **kw)
    params = mod.init(KEY)
    x = jnp.ones((2, 7, 48))
    y = mod(params, x)
    assert y.shape == (2, 7, 64)


def test_get_mlp_projector_selector():
    assert isinstance(get_mlp_projector(8, 16, "linear"), LinearProjector)
    assert isinstance(get_mlp_projector(8, 16, "gelu-mlp"), MLPProjector)
    assert isinstance(get_mlp_projector(8, 16, "fused-gelu-mlp"), FusedMLPProjector)
    with pytest.raises(ValueError):
        get_mlp_projector(8, 16, "bogus")


def test_mlp_projector_matches_torch():
    """gelu-mlp projector == torch Linear/GELU/Linear with copied weights."""
    mod = MLPProjector(12, 20)
    params = mod.init(KEY)
    ref = torch.nn.Sequential(
        torch.nn.Linear(12, 20), torch.nn.GELU(), torch.nn.Linear(20, 20)
    )
    with torch.no_grad():
        for i, lin in enumerate([ref[0], ref[2]]):
            lin.weight.copy_(torch.from_numpy(np.asarray(params["projector"][str(i)]["kernel"]).T))
            lin.bias.copy_(torch.from_numpy(np.asarray(params["projector"][str(i)]["bias"])))
    x = np.random.randn(3, 5, 12).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(mod(params, jnp.asarray(x))), ref(torch.from_numpy(x)).detach().numpy(), atol=1e-5
    )


# ---------------------------------------------------------------------------
# Token resamplers
# ---------------------------------------------------------------------------


def test_average_pooling_projector():
    mod = AveragePoolingProjector(32, 48, output_size=4, output_frames=8, mlp_type="linear")
    params = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 8, 14 * 14, 32))
    y = mod(params, x)
    assert y.shape == (2, 8 * 16, 48)
    assert mod.output_token_length == 16 and mod.output_frame_length == 8


def test_average_pooling_3d_projector():
    mod = AveragePooling3DProjector(32, 48, output_frames=4, output_size=4, mlp_type="gelu-mlp")
    params = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 16, 14 * 14, 32))
    y = mod(params, x)
    assert y.shape == (2, 4 * 16, 48)


def test_average_pooling_3d_projector_matches_torch():
    """Pool + linear vs torch AdaptiveAvgPool3d + Linear, copied weights."""
    mod = AveragePooling3DProjector(10, 6, output_frames=4, output_size=2, mlp_type="linear")
    params = mod.init(KEY)
    x = np.random.randn(2, 8, 7 * 7, 10).astype(np.float32)

    xt = torch.from_numpy(x.reshape(2, 8, 7, 7, 10).transpose(0, 4, 1, 2, 3))  # B C F H W
    pooled = torch.nn.AdaptiveAvgPool3d((4, 2, 2))(xt)
    pooled = pooled.permute(0, 2, 3, 4, 1).reshape(2, 16, 10)
    lin = torch.nn.Linear(10, 6)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(params["projector"]["projector"]["kernel"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(params["projector"]["projector"]["bias"])))
    ref = lin(pooled).detach().numpy()
    np.testing.assert_allclose(np.asarray(mod(params, jnp.asarray(x))), ref, atol=1e-5)


def test_attentive_pooler():
    mod = AttentivePooler(32, 48, num_query_tokens=16, num_heads=8, output_frames=4, mlp_type="linear")
    params = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 4, 49, 32))
    y = mod(params, x)
    assert y.shape == (2, 4 * 16, 48)
    assert mod.output_token_length == 16


def test_convolutional_projector():
    mod = ConvolutionalProjector(32, 24, output_size=4, block_depth=2, output_frames=4, mlp_type="linear")
    params = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 4, 49, 32))
    y = mod(params, x)
    assert y.shape == (2, 4 * 16, 24)


def test_convolutional_3d_projector():
    mod = Convolutional3DProjector(16, 24, output_frames=4, output_size=2, mlp_type="linear")
    params = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 8, 49, 16))
    y = mod(params, x)
    assert y.shape == (2, 4 * 4, 24)


def test_conv3d_matches_torch():
    """Conv3d layer parity (weight layout interchange with torch)."""
    mod = Convolutional3DProjector(6, 8, output_frames=2, output_size=2, mlp_type="none")
    params = mod.init(KEY)
    x = np.random.randn(1, 4, 16, 6).astype(np.float32)

    conv = torch.nn.Conv3d(6, 8, 3, 1, 1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.asarray(params["conv"]["kernel"])))
        conv.bias.copy_(torch.from_numpy(np.asarray(params["conv"]["bias"])))
    xt = torch.from_numpy(x.reshape(1, 4, 4, 4, 6).transpose(0, 4, 1, 2, 3))
    y = conv(xt)
    y = torch.nn.AdaptiveAvgPool3d((2, 2, 2))(y)
    ref = y.permute(0, 2, 3, 4, 1).reshape(1, 8, 8).detach().numpy()
    np.testing.assert_allclose(np.asarray(mod(params, jnp.asarray(x))), ref, atol=1e-4)


# ---------------------------------------------------------------------------
# Fusion adapters
# ---------------------------------------------------------------------------


def test_cross_attention_adapter_shapes_and_weights():
    mod = CrossAttentionAdapterLearnableQuery(
        embed_dim=64, llm_dim=32, token_length=8, averagetoken=True, num_encoder=3
    )
    params = mod.init(KEY)
    V = [jax.random.normal(jax.random.PRNGKey(i), (2, 8, 32)) for i in range(3)]
    fused, weights = mod(params, V)
    assert fused.shape == (2, 8, 32)
    assert weights.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(weights.sum(-1)), 1.0, atol=1e-5)


def test_cross_attention_adapter_broadcast_single_token():
    mod = CrossAttentionAdapterLearnableQuery(embed_dim=16, llm_dim=8, token_length=4, averagetoken=True, num_encoder=2)
    params = mod.init(KEY)
    V = [jnp.ones((2, 4, 8)), jnp.ones((2, 1, 8))]  # second stream broadcasts
    fused, weights = mod(params, V)
    assert fused.shape == (2, 4, 8)


@pytest.mark.parametrize("averagetoken", [True, False])
def test_cross_attention_adapter_matches_torch(averagetoken):
    """Mixing weights + fused output vs torch nn.MultiheadAttention + bmm."""
    d, llm, T, E, B = 24, 8, 4, 3, 2
    mod = CrossAttentionAdapterLearnableQuery(
        embed_dim=d, llm_dim=llm, token_length=T, averagetoken=averagetoken, num_encoder=E
    )
    params = mod.init(KEY)
    kdim = llm if averagetoken else T * llm

    mha = torch.nn.MultiheadAttention(d, 1, batch_first=True, kdim=kdim, vdim=kdim)
    with torch.no_grad():
        mha.q_proj_weight.copy_(torch.from_numpy(np.asarray(params["attention"]["q_proj"]["kernel"]).T))
        mha.k_proj_weight.copy_(torch.from_numpy(np.asarray(params["attention"]["k_proj"]["kernel"]).T))
        mha.v_proj_weight.copy_(torch.from_numpy(np.asarray(params["attention"]["v_proj"]["kernel"]).T))
        mha.in_proj_bias.zero_()

    rng = np.random.RandomState(0)
    V_np = [rng.randn(B, T, llm).astype(np.float32) for _ in range(E)]
    Q = torch.from_numpy(np.asarray(params["Q"])).repeat(B, 1).unsqueeze(1)
    Vt = torch.stack([torch.from_numpy(v) for v in V_np], 1)  # [B, E, T, C]
    keys = Vt.mean(2) if averagetoken else Vt.reshape(B, E, T * llm)
    with torch.no_grad():
        _, w_ref = mha(Q, keys, keys)
        fused_ref = torch.bmm(w_ref, Vt.reshape(B, E, T * llm)).reshape(B, T, llm)

    fused, weights = mod(params, [jnp.asarray(v) for v in V_np])
    np.testing.assert_allclose(np.asarray(weights), w_ref[:, 0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused), fused_ref.numpy(), atol=1e-5)


def test_scalar_adapter():
    mod = ScalarAdapter(num_encoder=4)
    params = mod.init(KEY)
    V = [jnp.full((2, 8, 16), float(i)) for i in range(4)]
    fused, mix = mod(params, V)
    assert fused.shape == (2, 8, 16)
    np.testing.assert_allclose(np.asarray(mix.sum()), 1.0, atol=1e-5)
    # fused values are a convex combination of the stream constants 0..3
    assert float(fused.min()) >= 0.0 and float(fused.max()) <= 3.0
