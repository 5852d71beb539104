"""Ring attention (sequence/context parallelism over the ``sp`` mesh axis).

Capability the reference does NOT have (SURVEY §5.7: no ring/context
parallelism anywhere; long sequences avoided via token resampling +
llm_max_length 2048). Parity is pinned against the materialized-scores
reference at fp32 on the virtual 8-device CPU mesh, including gradients
(training runs the ring backward as a reversed scan of ppermutes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merv_tpu.ops.attention import attention_reference
from merv_tpu.ops.ring_attention import constrain_seq_dim, ring_attention
from merv_tpu.parallel import MeshConfig, build_mesh
from merv_tpu.parallel.mesh import SEQ_AXIS


@pytest.fixture(scope="module")
def sp_mesh():
    # 2-way data x 4-way sequence ring
    return build_mesh(MeshConfig(data=2, fsdp=1, tensor=1, seq=4))


def _qkv(key, B, H, Hk, S, D, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, D), dtype)
    k = jax.random.normal(kk, (B, Hk, S, D), dtype)
    v = jax.random.normal(kv, (B, Hk, S, D), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_reference_fp32(sp_mesh, causal):
    q, k, v = _qkv(jax.random.PRNGKey(0), 2, 4, 4, 64, 16)
    ref = attention_reference(q, k, v, causal=causal)
    out = jax.jit(
        lambda q, k, v: ring_attention(q, k, v, sp_mesh, causal=causal)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=2e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_gqa(sp_mesh, causal):
    q, k, v = _qkv(jax.random.PRNGKey(1), 2, 8, 2, 32, 8)
    ref = attention_reference(q, k, v, causal=causal)
    out = jax.jit(
        lambda q, k, v: ring_attention(q, k, v, sp_mesh, causal=causal)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=2e-6)


def test_ring_bf16(sp_mesh):
    q, k, v = _qkv(jax.random.PRNGKey(2), 2, 4, 4, 64, 16, jnp.bfloat16)
    ref = attention_reference(q, k, v, causal=True)
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, sp_mesh, causal=True))(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_ring_grads_match_reference(sp_mesh):
    """The ring must be reverse-differentiable (scan + ppermute transpose) and
    match the reference attention's gradients — this is what makes it usable
    in the training step, not just serving."""
    q, k, v = _qkv(jax.random.PRNGKey(3), 1, 2, 2, 32, 8)

    def loss_ring(q, k, v):
        out = ring_attention(q, k, v, sp_mesh, causal=True)
        return jnp.sum(out * out)

    def loss_ref(q, k, v):
        out = attention_reference(q, k, v, causal=True)
        return jnp.sum(out * out)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_q_chunking_matches(sp_mesh, causal):
    """The q-chunked streaming update (block_q < Sq, the long-context memory
    path) is the same math as a single chunk — incl. gradients through the
    remat'd chunk body."""
    q, k, v = _qkv(jax.random.PRNGKey(6), 1, 2, 2, 64, 8)  # Sq=16/device

    def loss(q, k, v, bq):
        out = ring_attention(q, k, v, sp_mesh, causal=causal, block_q=bq)
        return jnp.sum(out * out)

    ref = attention_reference(q, k, v, causal=causal)
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, sp_mesh, causal=causal, block_q=4))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=2e-6)

    g_1 = jax.jit(jax.grad(lambda q, k, v: loss(q, k, v, 512), argnums=(0, 1, 2)))(q, k, v)
    g_4 = jax.jit(jax.grad(lambda q, k, v: loss(q, k, v, 4), argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_4, g_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_ring_q_block_divisor():
    from merv_tpu.ops.ring_attention import _ring_q_block

    assert _ring_q_block(1024, 512) == 512
    assert _ring_q_block(1088, 512) == 272  # divisor, not a pad
    assert _ring_q_block(7, 512) == 7
    assert _ring_q_block(30, 8) == 6


def test_zigzag_perm_roundtrip():
    from merv_tpu.ops.ring_attention import zigzag_perm

    perm = zigzag_perm(16, 4)  # 8 chunks of 2; device d owns chunks d, 7-d
    assert perm.tolist() == [0, 1, 14, 15, 2, 3, 12, 13, 4, 5, 10, 11, 6, 7, 8, 9]
    assert sorted(perm.tolist()) == list(range(16))


@pytest.mark.parametrize("block_q", [512, 4])
def test_zigzag_ring_matches_reference(sp_mesh, block_q):
    """The load-balanced causal ring (zigzag layout) is the same math as the
    reference — forward and gradients — in both the single-chunk and the
    streamed-q configurations."""
    from merv_tpu.ops.ring_attention import zigzag_perm

    q, k, v = _qkv(jax.random.PRNGKey(7), 2, 4, 2, 64, 8)
    perm = zigzag_perm(64, 4)
    inv = np.argsort(perm)
    ref = attention_reference(q, k, v, causal=True)

    def zig(q, k, v):
        o = ring_attention(
            q[:, :, perm], k[:, :, perm], v[:, :, perm], sp_mesh,
            causal=True, zigzag=True, block_q=block_q,
        )
        return o[:, :, inv]

    out = jax.jit(zig)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=2e-6)

    g_z = jax.jit(jax.grad(lambda *a: jnp.sum(zig(*a) ** 2), argnums=(0, 1, 2)))(q, k, v)
    g_r = jax.grad(
        lambda *a: jnp.sum(attention_reference(*a, causal=True) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b in zip(g_z, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_zigzag_rejects_bad_shapes(sp_mesh):
    q, k, v = _qkv(jax.random.PRNGKey(8), 1, 2, 2, 36, 8)  # 36 % 8 != 0
    with pytest.raises(ValueError, match="zigzag"):
        ring_attention(q, k, v, sp_mesh, causal=True, zigzag=True)
    with pytest.raises(ValueError, match="causal"):
        ring_attention(q[:, :, :32], k[:, :, :32], v[:, :, :32], sp_mesh, zigzag=True)


def test_decoder_zigzag_right_padding_matches_plain(sp_mesh):
    """Zigzag + a right-padded batch: the ring masks by original physical
    indices (they travel with the tokens), so pad keys stay invisible and
    valid rows match the plain decoder exactly."""
    from merv_tpu.parallel.sharding import activation_mesh

    dec_sp, dec = _tiny_decoder(True)
    assert dec_sp.cfg.sp_zigzag  # default on
    params = dec.init(jax.random.PRNGKey(9))
    ids = jnp.asarray(np.random.RandomState(9).randint(2, 64, (2, 16)), jnp.int32)
    mask = jnp.asarray([[1] * 16, [1] * 11 + [0] * 5], jnp.int32)  # row 1 padded

    ref, _ = dec(params, input_ids=ids, attention_mask=mask)
    with activation_mesh(sp_mesh):
        out, _ = jax.jit(lambda p, i, m: dec_sp(p, input_ids=i, attention_mask=m))(params, ids, mask)
    # compare only valid rows (pad rows compute garbage nothing reads)
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], atol=1e-5, rtol=1e-5
    )


def test_ring_falls_back_off_mesh():
    """sp=1 mesh routes to the plain attention dispatcher."""
    mesh = build_mesh(MeshConfig(data=2, fsdp=4, tensor=1))
    assert mesh.shape[SEQ_AXIS] == 1
    q, k, v = _qkv(jax.random.PRNGKey(4), 2, 2, 2, 16, 8)
    ref = attention_reference(q, k, v, causal=True)
    out = ring_attention(q, k, v, mesh, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=2e-6)


def test_ring_rejects_indivisible_seq(sp_mesh):
    q, k, v = _qkv(jax.random.PRNGKey(5), 1, 2, 2, 30, 8)
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, k, v, sp_mesh, causal=True)


def test_constrain_seq_dim(sp_mesh):
    x = jnp.zeros((4, 64, 8))
    y = jax.jit(lambda x: constrain_seq_dim(x, sp_mesh))(x)
    assert y.shape == x.shape
    # indivisible seq: silent no-op (tiny-test tolerance)
    z = constrain_seq_dim(jnp.zeros((4, 30, 8)), sp_mesh)
    assert z.shape == (4, 30, 8)
    assert constrain_seq_dim(x, None) is x


# -- decoder integration -------------------------------------------------------------


def _tiny_decoder(sequence_parallel):
    import dataclasses

    from merv_tpu.models.backbones.llm.transformer import LlamaDecoder, tiny_decoder_config

    cfg = tiny_decoder_config(
        num_layers=3, compute_dtype=jnp.float32, sequence_parallel=sequence_parallel
    )
    return LlamaDecoder(cfg), LlamaDecoder(dataclasses.replace(cfg, sequence_parallel=False))


def test_decoder_sequence_parallel_matches_plain(sp_mesh):
    """The no-cache decoder forward under an sp mesh must match the plain
    forward: sequence parallelism is a layout/collective choice, not math."""
    from merv_tpu.parallel.sharding import activation_mesh

    dec_sp, dec = _tiny_decoder(True)
    params = dec.init(jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(2, 64, (2, 16)), jnp.int32)
    mask = jnp.ones_like(ids)

    ref, _ = jax.jit(lambda p, i, m: dec(p, input_ids=i, attention_mask=m))(params, ids, mask)

    def fwd(p, i, m):
        with activation_mesh(sp_mesh):
            return dec_sp(p, input_ids=i, attention_mask=m)

    out, _ = jax.jit(fwd)(params, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_decoder_sp_grads_and_remat(sp_mesh):
    """Training path: grads under sequence parallelism (incl. remat'd layer
    scan wrapping the ring's shard_map) match the plain decoder's."""
    from merv_tpu.parallel.sharding import activation_mesh

    dec_sp, dec = _tiny_decoder(True)
    params = dec.init(jax.random.PRNGKey(1))
    ids = jnp.asarray(np.random.RandomState(1).randint(2, 64, (2, 16)), jnp.int32)
    mask = jnp.ones_like(ids)

    def loss_plain(p):
        logits, _ = dec(p, input_ids=ids, attention_mask=mask, remat=True)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    def loss_sp(p):
        with activation_mesh(sp_mesh):
            logits, _ = dec_sp(p, input_ids=ids, attention_mask=mask, remat=True)
            return jnp.mean(logits.astype(jnp.float32) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_plain)(params)
    l_sp, g_sp = jax.jit(jax.value_and_grad(loss_sp))(params)
    np.testing.assert_allclose(float(l_sp), float(l_ref), atol=1e-6, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        g_sp, g_ref,
    )


def test_decoder_sp_indivisible_seq_falls_back(sp_mesh):
    """A sequence that doesn't tile the ring silently uses plain attention
    (same tolerance contract as constrain_batch_dim for tiny shapes)."""
    from merv_tpu.parallel.sharding import activation_mesh

    dec_sp, dec = _tiny_decoder(True)
    params = dec.init(jax.random.PRNGKey(2))
    ids = jnp.asarray(np.random.RandomState(2).randint(2, 64, (2, 10)), jnp.int32)

    ref, _ = dec(params, input_ids=ids)
    with activation_mesh(sp_mesh):
        out, _ = jax.jit(lambda p, i: dec_sp(p, input_ids=i))(params, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_decoder_sp_serving_cache_numerics_unchanged(sp_mesh):
    """The cache-carrying (serving) path under an sp mesh routes through
    sharded_cache_attention (the cache shards its sequence dim; no ring) —
    numerics must be identical to the single-device cache path. A cache
    length that doesn't tile the axis falls back to plain attention."""
    from merv_tpu.models.backbones.llm.transformer import KVCache
    from merv_tpu.parallel.sharding import activation_mesh

    dec_sp, dec = _tiny_decoder(True)
    params = dec.init(jax.random.PRNGKey(3))
    ids = jnp.asarray(np.random.RandomState(3).randint(2, 64, (1, 8)), jnp.int32)
    for max_len in (16, 18):  # 16 tiles sp=4 (sharded path); 18 falls back
        cache = KVCache.create(dec_sp.cfg, 1, max_len, dtype=jnp.float32)
        with activation_mesh(sp_mesh):
            out_sp, _ = jax.jit(lambda p, i, c: dec_sp(p, input_ids=i, kv_cache=c))(params, ids, cache)
        out, _ = dec(params, input_ids=ids, kv_cache=cache)
        np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out), atol=1e-5, rtol=1e-5)


def test_ring_bf16_replicated_batch_grads():
    """bf16 grads with a batch that does NOT divide data*fsdp (inputs
    replicated over those axes): the fp32 shard_map boundary must kick in —
    the bf16 form CHECK-fails XLA's CPU SPMD partitioner (the psum-of-
    cotangents bug parallel/pipeline.py documents)."""
    mesh = build_mesh(MeshConfig(data=2, fsdp=2, tensor=1, seq=2))
    q, k, v = _qkv(jax.random.PRNGKey(11), 1, 2, 2, 16, 8, jnp.bfloat16)

    def loss(q, k, v):
        out = ring_attention(q, k, v, mesh, causal=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    ref = jax.grad(
        lambda *a: jnp.sum(attention_reference(*a, causal=True).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-2, rtol=5e-2
        )


def test_decoder_sp_composes_with_tensor_parallel():
    """tp=2 x sp=2 on one mesh: the ring shards heads over 'tensor' and the
    sequence over 'sp' simultaneously (GQA head counts divide tp)."""
    from merv_tpu.parallel.sharding import activation_mesh

    mesh = build_mesh(MeshConfig(data=1, fsdp=2, tensor=2, seq=2))
    dec_sp, dec = _tiny_decoder(True)
    params = dec.init(jax.random.PRNGKey(10))
    ids = jnp.asarray(np.random.RandomState(10).randint(2, 64, (2, 16)), jnp.int32)

    ref, _ = dec(params, input_ids=ids)

    def fwd(p, i):
        with activation_mesh(mesh):
            return dec_sp(p, input_ids=i)

    out, _ = jax.jit(fwd)(params, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_sharded_cache_attention_matches_reference(sp_mesh):
    """Serving attention against an sp-sharded KV cache: cross-chip
    online-softmax merge equals the single-device cache attention (causal via
    q_offset + validity mask), for both a prefill-shaped and a decode-shaped
    query block."""
    from merv_tpu.ops.ring_attention import sharded_cache_attention

    rs = np.random.RandomState(12)
    B, H, Hk, L, D = 2, 4, 2, 32, 8
    k = jnp.asarray(rs.randn(B, Hk, L, D), jnp.float32)
    v = jnp.asarray(rs.randn(B, Hk, L, D), jnp.float32)
    kv_mask = jnp.asarray(np.arange(L)[None, :] < np.array([[20], [14]]), jnp.bool_)

    for T, off in [(8, 12), (1, 19)]:
        q = jnp.asarray(rs.randn(B, H, T, D), jnp.float32)
        ref = attention_reference(q, k, v, causal=True, kv_mask=kv_mask, q_offset=off)
        out = jax.jit(
            lambda q, k, v, m: sharded_cache_attention(
                q, k, v, m, sp_mesh, q_offset=jnp.int32(off)
            )
        )(q, k, v, kv_mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=2e-6)


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8])
def test_decoder_sp_sharded_cache_serving(sp_mesh, cache_dtype):
    """Full decoder serving path with an sp-sharded KV cache: prefill + two
    decode steps produce the same logits as the single-device cache path —
    the long-video serving capability (cache memory L/n per chip). The int8
    variant shards the quantized buffers + scales the same way (dequant is
    elementwise on the shard)."""
    from merv_tpu.models.backbones.llm.transformer import KVCache
    from merv_tpu.parallel.sharding import activation_mesh

    dec_sp, dec = _tiny_decoder(True)
    params = dec.init(jax.random.PRNGKey(13))
    rs = np.random.RandomState(13)
    ids = jnp.asarray(rs.randint(2, 64, (1, 8)), jnp.int32)
    max_len = 16  # divisible by sp=4

    def serve(d, use_mesh):
        cache = KVCache.create(d.cfg, 1, max_len, dtype=cache_dtype)
        ctx = activation_mesh(sp_mesh) if use_mesh else activation_mesh(None)
        with ctx:
            step1 = jax.jit(lambda p, i, c: d(p, input_ids=i, kv_cache=c))
            logits, cache = step1(params, ids, cache)
            outs = [logits[:, -1:]]
            step = jax.jit(lambda p, i, c: d(p, input_ids=i, kv_cache=c))
            for _ in range(2):
                nxt = jnp.argmax(outs[-1], axis=-1).astype(jnp.int32)
                logits, cache = step(params, nxt, cache)
                outs.append(logits[:, -1:])
        return jnp.concatenate(outs, axis=1)

    ref = serve(dec, False)
    out = serve(dec_sp, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_merv_full_model_sp_loss_and_grads(sp_mesh):
    """Sequence parallelism through the REAL multimodal stack: tiny MERV
    (tower -> projector -> fusion -> splice-after-BOS -> decoder) computes the
    same loss and gradients under an sp mesh as on a single device — the
    training-step-level guarantee, not just the attention op's."""
    import dataclasses as dc

    from merv_tpu.models.backbones.llm.base_llm import tiny_llm_backbone
    from merv_tpu.models.backbones.video.dinov2_video import DinoV2VideoBackbone
    from merv_tpu.models.backbones.video.vit import tiny_vit_config
    from merv_tpu.models.materialize import get_vidlm
    from merv_tpu.parallel.sharding import activation_mesh

    t = tiny_vit_config(num_cls_tokens=1, num_register_tokens=4, use_layerscale=True)
    TinyDino = type("TinyDino", (DinoV2VideoBackbone,), {
        "vit_config": property(lambda self, _t=t: dc.replace(_t)),
    })
    tower = TinyDino("dinov2-video-all-tokens", "resize-naive", default_image_size=32, num_frames=4)
    llm = tiny_llm_backbone(compute_dtype=jnp.float32, sequence_parallel=True)
    model = get_vidlm(
        "tiny-sp", "no-align+3davg+linear", "cross_attention_avg_lq",
        [tower], llm, projector_token_length=4, visual_feature_length=16,
    )
    params = model.init(jax.random.PRNGKey(0))

    B, T = 2, 16  # visual 16 + text 16 = 32 tokens: tiles the 4-ring
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(2, 64, (B, T)), jnp.int32).at[:, 0].set(1)
    mask = jnp.ones((B, T), jnp.int32)
    labels = jnp.asarray(rs.randint(2, 64, (B, T)), jnp.int32)
    videos = [jnp.asarray(rs.randn(B, *tower.default_video_resolution), jnp.float32)]

    def loss(p):
        out = model.forward(p, ids, mask, videos, labels=labels)
        return out["loss"]

    l_ref, g_ref = jax.value_and_grad(loss)(params)

    def loss_sp(p):
        with activation_mesh(sp_mesh):
            return loss(p)

    l_sp, g_sp = jax.jit(jax.value_and_grad(loss_sp))(params)
    np.testing.assert_allclose(float(l_sp), float(l_ref), atol=1e-5, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-4, rtol=5e-3
        ),
        g_sp, g_ref,
    )
