"""Pipeline parallelism (GPipe over the ``pp`` mesh axis).

Capability the reference does NOT have (its distributed story is one 8-GPU
FSDP node, reference ``merv/training/strategies/fsdp.py``). Parity is pinned
against the plain layer scan at fp32 on the virtual 8-device CPU mesh,
including gradients (AD replays the pipeline backward through the ppermutes).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from merv_tpu.parallel import MeshConfig, build_mesh, fsdp_specs
from merv_tpu.parallel.mesh import PIPE_AXIS
from merv_tpu.parallel.pipeline import pipeline_layer_scan, resolve_microbatches


@pytest.fixture(scope="module")
def pp4_mesh():
    # 2-way data x 4-stage pipeline
    return build_mesh(MeshConfig(data=2, fsdp=1, tensor=1, pipe=4))


@pytest.fixture(scope="module")
def pp2_mesh():
    # 2-way data x 2-way fsdp x 2-stage pipeline
    return build_mesh(MeshConfig(data=2, fsdp=2, tensor=1, pipe=2))


def test_resolve_microbatches():
    assert resolve_microbatches(8, 2) == 4       # min(2*pp, B)
    assert resolve_microbatches(8, 4) == 8
    assert resolve_microbatches(6, 4) == 6       # 8 -> 7 -> 6 divides
    assert resolve_microbatches(1, 4) == 1       # B=1 still pipelines
    assert resolve_microbatches(8, 2, requested=2) == 2
    with pytest.raises(ValueError, match="does not divide"):
        resolve_microbatches(8, 2, requested=3)  # loud, not a silent fallback
    assert resolve_microbatches(0, 2) is None


# -- pipeline_layer_scan vs plain scan ------------------------------------------------


def _toy(key, L, B, T, D):
    kw, kx, kc = jax.random.split(key, 3)
    W = jax.random.normal(kw, (L, D, D), jnp.float32) * (D ** -0.5)
    x = jax.random.normal(kx, (B, T, D), jnp.float32)
    cos = jax.random.normal(kc, (B, T, D), jnp.float32) * 0.1
    sin = jnp.flip(cos, axis=-1)
    return {"w": W}, x, (cos, sin)


def _toy_layer(lp, h, cs):
    cos, sin = cs
    return jnp.tanh(h @ lp["w"] + cos) + sin


def _plain(layers, x, cs):
    def f(h, lp):
        return _toy_layer(lp, h, cs), None

    h, _ = jax.lax.scan(f, x, layers)
    return h


@pytest.mark.parametrize("microbatches", [1, 2, 4])
def test_pipeline_matches_plain_scan(pp4_mesh, microbatches):
    layers, x, cs = _toy(jax.random.PRNGKey(0), L=8, B=4, T=8, D=16)
    ref = _plain(layers, x, cs)
    out = jax.jit(
        lambda l, x, c, s: pipeline_layer_scan(
            _toy_layer, x, (c, s), l, pp4_mesh, microbatches=microbatches
        )
    )(layers, x, *cs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("remat", [False, True])
def test_pipeline_grads_match_plain(pp4_mesh, remat):
    """AD must derive the backward pipeline (reversed ppermutes); remat of the
    per-layer body must compose — this is what makes pp trainable."""
    layers, x, cs = _toy(jax.random.PRNGKey(1), L=4, B=4, T=8, D=16)

    def loss_plain(l, x):
        return jnp.sum(_plain(l, x, cs) ** 2)

    def loss_pipe(l, x):
        out = pipeline_layer_scan(
            _toy_layer, x, cs, l, pp4_mesh, microbatches=2, remat=remat
        )
        return jnp.sum(out ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_plain, argnums=(0, 1))(layers, x)
    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_pipe, argnums=(0, 1)))(layers, x)
    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
        g_pp, g_ref,
    )


def test_pipeline_composes_with_fsdp(pp2_mesh):
    """pp x fsdp on one mesh: GSPMD-auto fsdp all-gathers keep working inside
    each manual pipeline stage."""
    layers, x, cs = _toy(jax.random.PRNGKey(2), L=4, B=4, T=8, D=16)
    ref = _plain(layers, x, cs)
    out = jax.jit(
        lambda l, x, c, s: pipeline_layer_scan(
            _toy_layer, x, (c, s), l, pp2_mesh, microbatches=2
        )
    )(layers, x, *cs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-6)


def test_pipeline_rejects_bad_shapes(pp4_mesh):
    layers, x, cs = _toy(jax.random.PRNGKey(3), L=6, B=4, T=8, D=16)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_layer_scan(_toy_layer, x, cs, layers, pp4_mesh, microbatches=2)
    layers, x, cs = _toy(jax.random.PRNGKey(3), L=8, B=4, T=8, D=16)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_layer_scan(_toy_layer, x, cs, layers, pp4_mesh, microbatches=3)


# -- parameter sharding ----------------------------------------------------------------


def test_fsdp_specs_shard_layer_stack_over_pp(pp2_mesh):
    params = {
        "llm_backbone": {
            "layers": {"mlp": {"kernel": np.zeros((4, 512, 256), np.float32)}},
            "embed_tokens": {"embedding": np.zeros((1024, 256), np.float32)},
        },
        # towers ALSO stack per-layer params under a 'layers' key but run
        # OUTSIDE the pipeline shard_map — they must never be pp-sharded
        "video_backbones": {
            "0": {"layers": {"mlp": {"kernel": np.zeros((4, 512, 256), np.float32)}}},
        },
    }
    specs = fsdp_specs(params, pp2_mesh)
    # stacked LLM layer leaf: layer dim on pp, fsdp on the largest remaining dim
    assert specs["llm_backbone"]["layers"]["mlp"]["kernel"] == P(PIPE_AXIS, "fsdp", None)
    # tower layer stacks and non-stacked leaves never see pp
    assert PIPE_AXIS not in tuple(specs["video_backbones"]["0"]["layers"]["mlp"]["kernel"])
    assert PIPE_AXIS not in tuple(specs["llm_backbone"]["embed_tokens"]["embedding"])


def test_fsdp_specs_pp_composes_with_tp_overrides(pp2_mesh):
    from merv_tpu.parallel import llm_tensor_parallel_rules

    params = {"llm_backbone": {"layers": {"attn": {"q_proj": {"kernel": np.zeros((4, 512, 256), np.float32)}}}}}
    specs = fsdp_specs(params, pp2_mesh, overrides=llm_tensor_parallel_rules())
    assert specs["llm_backbone"]["layers"]["attn"]["q_proj"]["kernel"] == P(PIPE_AXIS, None, "tensor")


# -- decoder integration ---------------------------------------------------------------


def _tiny_decoder(pipeline_parallel, num_layers=4, **kw):
    from merv_tpu.models.backbones.llm.transformer import LlamaDecoder, tiny_decoder_config

    cfg = tiny_decoder_config(
        num_layers=num_layers, compute_dtype=jnp.float32,
        pipeline_parallel=pipeline_parallel, **kw,
    )
    return LlamaDecoder(cfg), LlamaDecoder(dataclasses.replace(cfg, pipeline_parallel=False))


def test_decoder_pipeline_matches_plain(pp4_mesh):
    """The no-cache decoder forward under a pp mesh must match the plain
    forward: pipelining is a schedule choice, not math."""
    from merv_tpu.parallel.sharding import activation_mesh

    dec_pp, dec = _tiny_decoder(True)
    params = dec.init(jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(2, 64, (4, 12)), jnp.int32)
    mask = jnp.ones_like(ids)

    ref, _ = jax.jit(lambda p, i, m: dec(p, input_ids=i, attention_mask=m))(params, ids, mask)

    def fwd(p, i, m):
        with activation_mesh(pp4_mesh):
            return dec_pp(p, input_ids=i, attention_mask=m)

    out, _ = jax.jit(fwd)(params, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_decoder_pp_grads_and_remat(pp2_mesh):
    """Training path: grads under the pipeline (incl. per-layer remat inside
    the stage scan) match the plain decoder's."""
    from merv_tpu.parallel.sharding import activation_mesh

    dec_pp, dec = _tiny_decoder(True)
    params = dec.init(jax.random.PRNGKey(1))
    ids = jnp.asarray(np.random.RandomState(1).randint(2, 64, (4, 12)), jnp.int32)
    mask = jnp.ones_like(ids)

    def loss_plain(p):
        logits, _ = dec(p, input_ids=ids, attention_mask=mask, remat=True)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    def loss_pp(p):
        with activation_mesh(pp2_mesh):
            logits, _ = dec_pp(p, input_ids=ids, attention_mask=mask, remat=True)
            return jnp.mean(logits.astype(jnp.float32) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_plain)(params)
    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_pp))(params)
    np.testing.assert_allclose(float(l_pp), float(l_ref), atol=1e-6, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        g_pp, g_ref,
    )


def test_decoder_pp_indivisible_layers_falls_back(pp4_mesh):
    """A layer count that doesn't tile the stages silently uses the plain scan
    (same tolerance contract as the sp path for tiny shapes)."""
    from merv_tpu.parallel.sharding import activation_mesh

    dec_pp, dec = _tiny_decoder(True, num_layers=3)
    params = dec.init(jax.random.PRNGKey(2))
    ids = jnp.asarray(np.random.RandomState(2).randint(2, 64, (2, 10)), jnp.int32)

    ref, _ = dec(params, input_ids=ids)
    with activation_mesh(pp4_mesh):
        out, _ = jax.jit(lambda p, i: dec_pp(p, input_ids=i))(params, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_decoder_pp_serving_cache_unaffected(pp4_mesh):
    """The cache-carrying (serving) path ignores pipeline_parallel: decode is
    latency-bound; pipelining is a training/prefill capability."""
    from merv_tpu.models.backbones.llm.transformer import KVCache
    from merv_tpu.parallel.sharding import activation_mesh

    dec_pp, dec = _tiny_decoder(True)
    params = dec.init(jax.random.PRNGKey(3))
    ids = jnp.asarray(np.random.RandomState(3).randint(2, 64, (1, 8)), jnp.int32)
    cache = KVCache.create(dec_pp.cfg, 1, 16, dtype=jnp.float32)
    with activation_mesh(pp4_mesh):
        out_pp, _ = dec_pp(params, input_ids=ids, kv_cache=cache)
    out, _ = dec(params, input_ids=ids, kv_cache=cache)
    np.testing.assert_allclose(np.asarray(out_pp), np.asarray(out), atol=1e-6, rtol=1e-6)


def test_decoder_pp_composes_with_tensor_parallel():
    """tp=2 x pp=2 on one mesh: Megatron head/ffn splits stay GSPMD-auto
    inside each pipeline stage."""
    from merv_tpu.parallel.sharding import activation_mesh

    mesh = build_mesh(MeshConfig(data=1, fsdp=2, tensor=2, seq=1, pipe=2))
    dec_pp, dec = _tiny_decoder(True)
    params = dec.init(jax.random.PRNGKey(11))
    ids = jnp.asarray(np.random.RandomState(11).randint(2, 64, (4, 12)), jnp.int32)

    ref, _ = dec(params, input_ids=ids)

    def fwd(p, i):
        with activation_mesh(mesh):
            return dec_pp(p, input_ids=i)

    out, _ = jax.jit(fwd)(params, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_decoder_pp_and_sp_both_active_raises():
    """pp>1 and sp>1 on one mesh with both flags set is a config error, not a
    silent wrong answer (the two manual shard_maps cannot nest)."""
    from merv_tpu.parallel.sharding import activation_mesh

    mesh = build_mesh(MeshConfig(data=1, fsdp=2, tensor=1, seq=2, pipe=2))
    dec_pp, _ = _tiny_decoder(True, sequence_parallel=True)
    params = dec_pp.init(jax.random.PRNGKey(4))
    ids = jnp.asarray(np.random.RandomState(4).randint(2, 64, (2, 8)), jnp.int32)
    with pytest.raises(ValueError, match="cannot both be active"):
        with activation_mesh(mesh):
            dec_pp(params, input_ids=ids)


def test_decoder_pp_frozen_params_stop_gradient(pp2_mesh):
    """Align-stage shape: stop_gradient'd layer params (frozen LLM) through
    the GPipe shard_map — activation cotangents must still flow to the inputs
    (the spliced visual tokens train) while layer grads are exactly zero."""
    from merv_tpu.parallel.sharding import activation_mesh

    dec_pp, dec = _tiny_decoder(True)
    params = dec.init(jax.random.PRNGKey(5))
    emb = jnp.asarray(np.random.RandomState(5).randn(4, 12, dec.cfg.hidden_size), jnp.float32)

    def frozen(p):
        return {**p, "layers": jax.tree_util.tree_map(jax.lax.stop_gradient, p["layers"])}

    def loss_plain(p, e):
        logits, _ = dec(frozen(p), inputs_embeds=e)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    def loss_pp(p, e):
        with activation_mesh(pp2_mesh):
            logits, _ = dec_pp(frozen(p), inputs_embeds=e)
            return jnp.mean(logits.astype(jnp.float32) ** 2)

    (l_ref, g_ref) = jax.value_and_grad(loss_plain, argnums=1)(params, emb)
    (l_pp, g_pp) = jax.jit(jax.value_and_grad(loss_pp, argnums=1))(params, emb)
    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_ref), atol=1e-5, rtol=1e-4)


def test_merv_full_model_pp_loss_and_grads(pp2_mesh):
    """Pipeline parallelism through the REAL multimodal stack: tiny MERV
    (tower -> projector -> fusion -> splice-after-BOS -> decoder) computes the
    same loss and gradients under a pp mesh as on a single device."""
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
    llm = tiny_llm_backbone(compute_dtype=jnp.float32, pipeline_parallel=True)
    model = get_vidlm(
        "tiny-pp", "no-align+3davg+linear", "cross_attention_avg_lq",
        [tower], llm, projector_token_length=4, visual_feature_length=16,
    )
    params = model.init(jax.random.PRNGKey(0))

    B, T = 2, 16
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(2, 64, (B, T)), jnp.int32).at[:, 0].set(1)
    mask = jnp.ones((B, T), jnp.int32)
    labels = jnp.asarray(rs.randint(2, 64, (B, T)), jnp.int32)
    videos = [jnp.asarray(rs.randn(B, *tower.default_video_resolution), jnp.float32)]

    def loss(p):
        out = model.forward(p, ids, mask, videos, labels=labels)
        return out["loss"]

    l_ref, g_ref = jax.value_and_grad(loss)(params)

    def loss_pp(p):
        with activation_mesh(pp2_mesh):
            return loss(p)

    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_pp))(params)
    np.testing.assert_allclose(float(l_pp), float(l_ref), atol=1e-5, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-4, rtol=5e-3
        ),
        g_pp, g_ref,
    )
