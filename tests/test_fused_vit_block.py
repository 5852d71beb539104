"""Whole-layer fused ViT attention block (merv_tpu/ops/fused_vit_block.py).

The round-5 experiment kernel: LN1 + qkv + attention + o-proj + LayerScale +
residual in one Pallas program. These tests pin, in interpreter mode on CPU:

- numerical parity with the composed XLA layer path (`vit.py::_layer`'s
  ln -> _mha -> layerscale -> residual) at a padded-odd sequence length,
- the key-side pad mask (padded rows must not receive softmax mass),
- the backward rule (XLA-reference recompute) against end-to-end autodiff
  of the XLA layer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import merv_tpu.ops.fused_vit_block as fvb
from merv_tpu.nn.core import LayerNorm

KEY = jax.random.PRNGKey(7)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fvb, "_INTERPRET", True)


def _params(D, key):
    ks = jax.random.split(key, 12)
    mk = lambda k, *s: jax.random.normal(k, s, jnp.float32) * 0.05  # noqa: E731
    return dict(
        ns=1.0 + 0.1 * mk(ks[0], D), nb=mk(ks[1], D),
        wq=mk(ks[2], D, D), bq=mk(ks[3], D),
        wk=mk(ks[4], D, D), bk=mk(ks[5], D),
        wv=mk(ks[6], D, D), bv=mk(ks[7], D),
        wo=mk(ks[8], D, D), bo=mk(ks[9], D),
        gamma=0.9 + 0.2 * mk(ks[10], D),
    )


def _xla_layer(x, p, heads, eps=1e-6):
    """The exact composed path the kernel replaces (vit.py::_layer)."""
    D = x.shape[-1]
    dh = D // heads
    ln = LayerNorm(D, eps=eps)
    xn = ln({"scale": p["ns"], "bias": p["nb"]}, x)
    def proj(w, b):
        y = xn @ w.astype(x.dtype) + b.astype(x.dtype)
        B, S, _ = y.shape
        return y.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
    q, k, v = proj(p["wq"], p["bq"]), proj(p["wk"], p["bk"]), proj(p["wv"], p["bv"])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * dh ** -0.5
    pr = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", pr, v)
    B, H, S, _ = o.shape
    o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
    y = o @ p["wo"].astype(x.dtype) + p["bo"].astype(x.dtype)
    return x + p["gamma"].astype(x.dtype) * y


def _fused(x, p, heads, eps=1e-6):
    return fvb.fused_vit_attn_block(
        x, p["ns"], p["nb"], p["wq"], p["bq"], p["wk"], p["bk"],
        p["wv"], p["bv"], p["wo"], p["bo"], p["gamma"], heads, eps,
    )


def test_fused_block_matches_xla_layer():
    """f32, odd seq (pad path + key mask): kernel == composed XLA layer."""
    B, S, D, H = 2, 37, 256, 4
    p = _params(D, KEY)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, D), jnp.float32)
    got = _fused(x, p, H)
    want = _xla_layer(x, p, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_block_bf16():
    B, S, D, H = 1, 16, 256, 4
    p = _params(D, jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(2), (B, S, D), jnp.float32).astype(jnp.bfloat16)
    got = np.asarray(_fused(x, p, H), np.float32)
    want = np.asarray(_xla_layer(x, p, H), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_fused_block_pad_mask_independence():
    """Result at S must be identical whether or not padding rows exist: an
    S=16 (no pad) input and the same rows inside an S=19 (padded to 32)
    input must agree on the first 16 rows IF the mask works. We check by
    comparing the fused output's first rows against the XLA layer computed
    at exactly S=19 — any softmax mass on pad keys would shift them."""
    B, S, D, H = 1, 19, 256, 4
    p = _params(D, jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(4), (B, S, D), jnp.float32)
    got = _fused(x, p, H)
    want = _xla_layer(x, p, H)
    assert got.shape == (B, S, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_block_grad_matches_xla():
    B, S, D, H = 1, 12, 256, 4
    p = _params(D, jax.random.PRNGKey(9))
    x = jax.random.normal(jax.random.PRNGKey(8), (B, S, D), jnp.float32)

    gf = jax.grad(lambda x_: jnp.sum(jnp.sin(_fused(x_, p, H))))(x)
    gx = jax.grad(lambda x_: jnp.sum(jnp.sin(_xla_layer(x_, p, H))))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=1e-4, atol=1e-4)


def test_vit_layer_env_flag_routes_to_kernel(monkeypatch):
    """MERV_TPU_FUSED_VIT_BLOCK=1 must route vit.py::_layer through the
    kernel on TPU and change nothing numerically. On CPU (can_use_pallas()
    False) the flag is inert — assert the layer still runs and the flag
    path is importable."""
    monkeypatch.setenv("MERV_TPU_FUSED_VIT_BLOCK", "1")
    from merv_tpu.models.backbones.video.vit import VisionTransformer, tiny_vit_config

    cfg = tiny_vit_config(use_layerscale=True, compute_dtype=jnp.float32, param_dtype=jnp.float32)
    vit = VisionTransformer(cfg)
    params = vit.init(jax.random.PRNGKey(0))
    pixels = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.image_size, cfg.image_size))
    out = vit(params, pixels)
    assert np.isfinite(np.asarray(out)).all()
