"""Flash-attention kernel correctness (interpret mode on CPU) vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import merv_tpu.ops.attention as A


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(A, "_INTERPRET", True)


def _rand_qkv(rng, B, H, Hk, Tq, Tk, D, dtype=jnp.float32):
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (B, H, Tq, D), dtype)
    k = jax.random.normal(ks[1], (B, Hk, Tk, D), dtype)
    v = jax.random.normal(ks[2], (B, Hk, Tk, D), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_reference(causal, rng):
    q, k, v = _rand_qkv(rng, B=2, H=4, Hk=4, Tq=256, Tk=256, D=128)
    ref = A.attention_reference(q, k, v, causal=causal)
    out = A._flash_forward(q, k, v, None, causal, 128.0 ** -0.5, 128, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_gqa_and_mask(rng):
    q, k, v = _rand_qkv(rng, B=2, H=8, Hk=2, Tq=256, Tk=384, D=128)
    kv_mask = jnp.asarray(np.random.RandomState(0).rand(2, 384) > 0.3)
    ref = A.attention_reference(q, k, v, causal=True, kv_mask=kv_mask)
    out = A._flash_forward(q, k, v, kv_mask, True, 128.0 ** -0.5, 128, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_ragged_seq_padding(rng):
    # Tq/Tk not multiples of the block size exercise the padding path
    q, k, v = _rand_qkv(rng, B=1, H=2, Hk=2, Tq=200, Tk=300, D=128)
    ref = A.attention_reference(q, k, v, causal=True)
    out = A._flash_forward(q, k, v, None, True, 128.0 ** -0.5, 128, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_cache_prefill_offset(rng):
    # chunked prefill against a 512-buffer cache: queries live at offset 128
    B, H, D = 1, 2, 128
    q, k, v = _rand_qkv(rng, B=B, H=H, Hk=H, Tq=128, Tk=512, D=D)
    offset = jnp.asarray(128, jnp.int32)
    kv_mask = (jnp.arange(512) < 256)[None, :]
    ref = A.attention_reference(q, k, v, causal=True, kv_mask=kv_mask, q_offset=offset)
    out = A._flash_forward(q, k, v, kv_mask, True, D ** -0.5, 128, 128, q_offset=offset)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("D", [64, 80])
def test_flash_head_dim_padding(D, rng):
    # head_dim < 128 (every vision tower is 64) pads to the 128-lane tile
    # inside the kernel; zero-padding must be numerically exact
    q, k, v = _rand_qkv(rng, B=2, H=4, Hk=4, Tq=256, Tk=256, D=D)
    ref = A.attention_reference(q, k, v)
    out = A._flash_forward(q, k, v, None, False, D ** -0.5, 128, 128)
    assert out.shape == q.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_head_dim_padding_masked_causal(rng):
    q, k, v = _rand_qkv(rng, B=2, H=4, Hk=2, Tq=256, Tk=256, D=64)
    kv_mask = jnp.asarray(np.random.RandomState(1).rand(2, 256) > 0.3)
    ref = A.attention_reference(q, k, v, causal=True, kv_mask=kv_mask)
    out = A._flash_forward(q, k, v, kv_mask, True, 64.0 ** -0.5, 128, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_bwd_path_pinning(monkeypatch):
    """Pin which backward path training actually takes (VERDICT weak #6):
    the padded 3072-token training shapes must satisfy the library-kernel
    constraints, and causal Tq != Tk must NOT (mask-alignment mismatch)."""
    monkeypatch.setattr(A, "_INTERPRET", False)
    monkeypatch.setattr(A, "can_use_pallas", lambda: True)
    train_q = jnp.zeros((1, 32, 3072, 128))
    assert A._bwd_compatible(train_q, train_q, True)
    assert A._bwd_compatible(train_q, train_q, False)
    # head_dim 64 towers: forward runs the padded custom kernel, backward
    # falls back to the XLA reference (towers are frozen in every stage)
    assert not A._bwd_compatible(jnp.zeros((1, 12, 3072, 64)), jnp.zeros((1, 12, 3072, 64)), False)
    # causal cross-length: library kernel's top-left mask != our right-aligned mask
    assert not A._bwd_compatible(jnp.zeros((1, 2, 512, 128)), jnp.zeros((1, 2, 1024, 128)), True)
    assert A._bwd_compatible(jnp.zeros((1, 2, 512, 128)), jnp.zeros((1, 2, 1024, 128)), False)


def test_flash_backward_grads(rng):
    q, k, v = _rand_qkv(rng, B=1, H=2, Hk=2, Tq=128, Tk=128, D=128)

    def loss_flash(q, k, v):
        return jnp.sum(A._flash_attention(q, k, v, True, 128.0 ** -0.5, 128, 128, False) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(A.attention_reference(q, k, v, causal=True) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_chunked_matches_reference(causal, rng):
    """The off-TPU memory-bounded path: GQA + mask + non-divisible Tq."""
    q, k, v = _rand_qkv(rng, B=2, H=8, Hk=2, Tq=300, Tk=384, D=64)
    kv_mask = jnp.asarray(np.random.RandomState(0).rand(2, 384) > 0.3)
    ref = A.attention_reference(q, k, v, causal=causal, kv_mask=kv_mask)
    out = A.attention_chunked(q, k, v, causal=causal, kv_mask=kv_mask, block_q=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_chunked_q_offset_and_grad(rng):
    B, H, D = 1, 2, 64
    q, k, v = _rand_qkv(rng, B=B, H=H, Hk=H, Tq=128, Tk=512, D=D)
    offset = jnp.asarray(128, jnp.int32)
    ref = A.attention_reference(q, k, v, causal=True, q_offset=offset)
    out = A.attention_chunked(q, k, v, causal=True, q_offset=offset, block_q=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # differentiable (remat'd body recomputes scores in the backward)
    loss_c = lambda q, k, v: A.attention_chunked(q, k, v, causal=True, block_q=64).sum()
    loss_r = lambda q, k, v: A.attention_reference(q, k, v, causal=True).sum()
    q2, k2, v2 = _rand_qkv(rng, B=2, H=4, Hk=4, Tq=192, Tk=192, D=64)
    g1 = jax.grad(loss_c, argnums=(0, 1, 2))(q2, k2, v2)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(q2, k2, v2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_dispatch_plan_pins_model_paths():
    """Pin which kernel every real model path runs (BASELINE.md crossover).

    Guards against silent dispatch regressions: a seq/projector change that
    moves the training shape off the flash path would revert to O(T^2)
    score materialization without failing any numeric test.
    """
    plan = lambda *a, **kw: A.dispatch_plan(
        *a, has_bias=kw.pop("has_bias", False),
        has_q_offset=kw.pop("has_q_offset", False), **kw
    )
    # LLM training step (padded 3072 tokens) and serving/batched prefill:
    # library flash kernel (fwd+bwd via its own Pallas VJP)
    assert plan(3072, 3072, 128, causal=True) == "library"
    assert plan(1088, 1088, 128, causal=True) == "library"
    # vision towers: whole-sequence small kernel at 257/261-token frames
    # (measured faster than XLA there), XLA at SigLIP's 196 and below
    assert plan(196, 196, 64, causal=False, self_shaped=True) == "xla"    # SigLIP
    assert plan(261, 261, 64, causal=False, self_shaped=True) == "small"  # DINOv2
    assert plan(257, 257, 64, causal=False, self_shaped=True) == "small"  # LanguageBind spatial
    assert plan(128, 128, 64, causal=False, self_shaped=True) == "xla"    # packed temporal (bias->xla anyway)
    assert plan(16, 16, 64, causal=False) == "xla"       # tiny seqs
    # the small kernel requires plain self-attention: masked or cross-shaped
    # calls stay on XLA
    assert plan(261, 261, 64, causal=False, self_shaped=True, has_mask=True) == "xla"
    assert plan(261, 261, 64, causal=False, self_shaped=False) == "xla"
    # ViViT's 3137-token video sequence: library flash (odd head dim, long T)
    assert plan(3137, 3137, 64, causal=False) == "library"
    # causal CROSS-length odd-D must NOT use the library kernel: its causal
    # mask is top-left aligned, ours is right-aligned (offset Tk-Tq)
    assert plan(2048, 4096, 64, causal=True) == "xla"
    assert plan(2048, 4096, 64, causal=False) == "library"
    # long non-causal with MXU-aligned head dim: our kernel
    assert plan(4096, 4096, 128, causal=False) == "pallas"
    # decode step against the KV cache: XLA
    assert plan(1, 2048, 128, causal=True, has_q_offset=True) == "xla"
    # additive bias is XLA-only
    assert plan(3072, 3072, 128, causal=True, has_bias=True) == "xla"
    # off-TPU, flash-sized shapes run the memory-bounded chunked path (so
    # CPU-mesh tests and the AOT memory proof model the real program);
    # short shapes stay on XLA; impl overrides win
    assert plan(3072, 3072, 128, causal=True, on_tpu=False) == "chunked"
    assert plan(3137, 3137, 64, causal=False, on_tpu=False) == "chunked"
    assert plan(261, 261, 64, causal=False, self_shaped=True, on_tpu=False) == "xla"
    assert plan(1, 2048, 128, causal=True, has_q_offset=True, on_tpu=False) == "xla"
    assert plan(196, 196, 64, causal=False, impl="pallas") == "pallas"
    assert plan(3072, 3072, 128, causal=True, on_tpu=False, impl="xla") == "xla"


def test_small_attention_kt_matches_reference(rng):
    """Pre-transposed-k tower kernel: q/v [B,H,T,D], kt [B,H,D,T]."""
    for T in (256, 261):
        q, k, v = _rand_qkv(rng, B=2, H=3, Hk=3, Tq=T, Tk=T, D=64)
        out = A.small_attention_kt(q, k.swapaxes(2, 3), v, 64 ** -0.5)
        ref = A.attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # differentiable (XLA-recompute backward; towers are frozen but grads
    # must still be correct for full-align experimentation)
    q, k, v = _rand_qkv(rng, B=1, H=2, Hk=2, Tq=232, Tk=232, D=64)
    loss_kt = lambda q, kt, v: A.small_attention_kt(q, kt, v, 64 ** -0.5).sum()
    loss_rf = lambda q, k, v: A.attention_reference(q, k, v).sum()
    g1 = jax.grad(loss_kt, argnums=(0, 1, 2))(q, k.swapaxes(2, 3), v)
    g2 = jax.grad(loss_rf, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1].swapaxes(2, 3)), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[2]), np.asarray(g2[2]), rtol=1e-4, atol=1e-4)


def test_vit_mha_transpose_free_path_matches(rng, monkeypatch):
    """The tower _mha's einsum-projected (transpose-free) small-kernel path
    must match the Linear+transpose XLA path on the same params."""
    import merv_tpu.models.backbones.video.vit as V

    cfg = V.tiny_vit_config()
    vit = V.VisionTransformer(cfg)
    params = vit.init(rng)
    lp = jax.tree_util.tree_map(lambda p: p[0], params["layers"])
    D = cfg.hidden_size
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 240, D), jnp.float32)  # S in the small-kernel window

    monkeypatch.setattr(V, "can_use_pallas", lambda: False)
    ref = vit._mha(lp["attn"], x)
    monkeypatch.setattr(V, "can_use_pallas", lambda: True)  # A._INTERPRET fixture keeps Pallas on CPU
    got = vit._mha(lp["attn"], x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_small_attention_matches_reference(rng):
    """Whole-sequence tower kernel (interpret mode) vs XLA reference,
    including the 16-sublane padding path (261 -> 272)."""
    for T in (256, 261):
        q, k, v = _rand_qkv(rng, B=2, H=3, Hk=3, Tq=T, Tk=T, D=64)
        out = A._small_attention(q, k, v, 64 ** -0.5)
        ref = A.attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_small_attention_backward(rng):
    """The small kernel's custom VJP (XLA recompute) matches reference grads."""
    q, k, v = _rand_qkv(rng, B=1, H=2, Hk=2, Tq=48, Tk=48, D=32)

    def loss_small(q, k, v):
        return jnp.sum(A._small_attention(q, k, v, 32 ** -0.5) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(A.attention_reference(q, k, v) ** 2)

    g1 = jax.grad(loss_small, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_small_attention_gqa_broadcasts_instead_of_asserting(rng):
    """Direct GQA-shaped calls broadcast kv heads (reference numerics) rather
    than dying on a self-shape assert; incompatible shapes raise ValueError."""
    import pytest

    q, k, v = _rand_qkv(rng, B=2, H=4, Hk=2, Tq=48, Tk=48, D=32)
    out = A._small_attention(q, k, v, 32 ** -0.5)
    ref = A.attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    _, k3, v3 = _rand_qkv(rng, B=2, H=4, Hk=3, Tq=48, Tk=48, D=32)
    with pytest.raises(ValueError, match="neither"):
        A._small_attention(q, k3, v3, 32 ** -0.5)  # 4 % 3 != 0


def test_pick_block_b_vmem_cap():
    """block_b * seq * head_dim must stay inside the library kernel's
    scoped-VMEM envelope: [8, 12, 3584, 64] with block_b=8 (1.84M elements)
    failed to compile on v5e (18.25M > 16 MiB scoped vmem); the largest
    measured-good config is LLM prefill [8, 32, 1216, 128] (1.245M)."""
    BUDGET = 8 * 1216 * 128
    # LLM prefill shapes (head_dim 128) keep the full measured block_b win
    assert A._pick_block_b(8, 1216, 128) == 8
    assert A._pick_block_b(2, 1088, 128) == 2
    # ViViT tower (head_dim 64) at bsz 8: capped to 4
    assert A._pick_block_b(8, 3584, 64) == 4
    assert A._pick_block_b(4, 3584, 64) == 4
    assert A._pick_block_b(2, 3584, 64) == 2
    # head_dim-128 shapes past the LLM envelope get capped where the old
    # seq-only cap would have let them through (e.g. bsz 8 padded to 1536)
    assert A._pick_block_b(8, 1536, 128) * 1536 * 128 <= BUDGET
    # block_b always divides the batch and is >= 1
    for b in (1, 2, 3, 5, 6, 8, 12):
        for s in (128, 1216, 3584, 8192, 100000):
            for d in (64, 128):
                bb = A._pick_block_b(b, s, d)
                assert 1 <= bb <= 8 and b % bb == 0
                assert bb * s * d <= BUDGET or bb == 1


def test_packed_temporal_attention_matches_reference(rng):
    """Fused LanguageBind temporal-attention kernel (interpret mode): rows are
    (frame, head) pairs, row r attends rows with the same head (r % H). Must
    equal per-head attention computed independently."""
    Bn, F, H, D = 3, 16, 8, 32
    R = F * H
    q = jax.random.normal(jax.random.PRNGKey(0), (Bn, R, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (Bn, R, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (Bn, R, D), jnp.float32)
    out = A.packed_temporal_attention(q, k.swapaxes(1, 2), v, D ** -0.5, H)

    # reference: unpack rows (f, h) -> per-head [Bn, H, F, D] attention
    qh = q.reshape(Bn, F, H, D).transpose(0, 2, 1, 3)
    kh = k.reshape(Bn, F, H, D).transpose(0, 2, 1, 3)
    vh = v.reshape(Bn, F, H, D).transpose(0, 2, 1, 3)
    ref = A.attention_reference(qh, kh, vh, scale=D ** -0.5)
    ref = ref.transpose(0, 2, 1, 3).reshape(Bn, R, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # backward (XLA-recompute VJP) matches reference grads
    loss_k = lambda q, kt, v: A.packed_temporal_attention(q, kt, v, D ** -0.5, H).sum()
    loss_r = lambda q, k, v: (
        A.attention_reference(
            q.reshape(Bn, F, H, D).transpose(0, 2, 1, 3),
            k.reshape(Bn, F, H, D).transpose(0, 2, 1, 3),
            v.reshape(Bn, F, H, D).transpose(0, 2, 1, 3),
            scale=D ** -0.5,
        ).sum()
    )
    g1 = jax.grad(loss_k, argnums=(0, 1, 2))(q, k.swapaxes(1, 2), v)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]).swapaxes(1, 2), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g1[2]), np.asarray(g2[2]), rtol=2e-4, atol=2e-4)


def test_mha_time_packed_kernel_path_matches_xla(rng, monkeypatch):
    """vit._mha_time_packed: the fused-kernel path (transpose-free einsum
    projections + packed_temporal_attention) must equal the XLA bias path on
    the same weights — the LanguageBind temporal branch contract."""
    import merv_tpu.models.backbones.video.vit as V

    # tiny config: H=4 heads, dh=16; F=32 frames -> R = 128 hits the kernel
    # gate (R % 128 == 0, dh % 16 == 0)
    cfg = V.tiny_vit_config(temporal_attn=True, temporal_frames=32)
    F = 32
    vit = V.VisionTransformer(cfg)
    params = vit.init(jax.random.PRNGKey(0))
    lp = jax.tree_util.tree_map(lambda p: p[0], params["layers"])
    Bn, Dm = 3, cfg.hidden_size
    x = jax.random.normal(jax.random.PRNGKey(5), (Bn, F, Dm), jnp.float32)

    monkeypatch.setattr(V, "can_use_pallas", lambda: False)
    ref = vit._mha_time_packed(lp["t_attn"], x)
    monkeypatch.setattr(V, "can_use_pallas", lambda: True)  # interpret keeps Pallas on CPU
    monkeypatch.setenv("MERV_TPU_TEMPORAL_KERNEL", "1")  # kernel path is opt-in
    got = vit._mha_time_packed(lp["t_attn"], x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
