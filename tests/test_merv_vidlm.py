"""MERV VidLM composition tests: arch grammar, splice semantics, loss, generate.

Mirrors the reference's runtime contract asserts (reference
``merv/models/vidlms/merv.py:174-207,503-734``) as real unit tests on tiny
backbones.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merv_tpu.models.backbones.llm.base_llm import tiny_llm_backbone
from merv_tpu.models.backbones.video import DinoV2VideoBackbone, SiglipVideoBackbone
from merv_tpu.models.backbones.video.vit import tiny_vit_config
from merv_tpu.models.vidlms import IGNORE_INDEX, MERV
from merv_tpu.nn.projectors import (
    AttentivePooler,
    AveragePooling3DProjector,
    AveragePoolingProjector,
    LinearProjector,
)

KEY = jax.random.PRNGKey(0)


@pytest.fixture(autouse=True)
def _restore_vit_config():
    saved = {}
    for cls in (DinoV2VideoBackbone, SiglipVideoBackbone):
        saved[cls] = cls.__dict__.get("vit_config")
    yield
    for cls, prop in saved.items():
        if prop is None:
            if "vit_config" in cls.__dict__:
                delattr(cls, "vit_config")
        else:
            setattr(cls, "vit_config", prop)


def _tiny(backbone, **cfg_overrides):
    tiny = tiny_vit_config(**cfg_overrides)
    type(backbone).vit_config = property(lambda self, _t=tiny: dataclasses.replace(_t))
    return backbone


def _make_towers():
    dino = DinoV2VideoBackbone("dinov2-video-all-tokens", "resize-naive", default_image_size=32, num_frames=4)
    _tiny(dino, num_cls_tokens=1, num_register_tokens=4, use_layerscale=True)
    sig = SiglipVideoBackbone("siglip-vit-b16-224px-all-no-cls", "resize-naive", default_image_size=32, num_frames=4)
    _tiny(sig, num_cls_tokens=0, pos_embed_includes_prefix=False)
    return [dino, sig]


def _make_merv(arch="no-align+3davg+linear", fusion="cross_attention_avg_lq", towers=None, vfl=16, **kw):
    towers = towers or _make_towers()
    llm = tiny_llm_backbone()
    # temporal_resolution 4, projector output 2x2 x 4 frames = 16 visual tokens
    model = MERV(
        "tiny-merv", towers, llm,
        arch_specifier=arch, feature_fusion=fusion,
        projector_token_length=4, visual_feature_length=vfl,
        text_embedding_dim=32, **kw,
    )
    return model


def _batch(model, B=2, T=8):
    V = model.visual_feature_length
    input_ids = jnp.full((B, T), 5, jnp.int32).at[:, 0].set(1)
    attention_mask = jnp.ones((B, T), jnp.int32).at[1, -2:].set(0)
    labels = jnp.where(attention_mask == 1, input_ids, IGNORE_INDEX).at[:, 0].set(IGNORE_INDEX)
    vids = [jnp.ones((B, *vb.default_video_resolution), jnp.float32) for vb in model.video_backbones]
    return input_ids, attention_mask, labels, vids


# ---------------------------------------------------------------------------
# arch_specifier grammar (reference merv.py:89-176)
# ---------------------------------------------------------------------------


def test_arch_3davg_linear():
    m = _make_merv("no-align+3davg+linear")
    assert all(isinstance(p, AveragePooling3DProjector) for p in m.projectors)
    assert m.tokens_resampled and m.visual_feature_length == 16
    assert all(p.mlp_type == "linear" for p in m.projectors)


def test_arch_avg_mlp():
    m = _make_merv("avg+gelu-mlp")
    assert all(isinstance(p, AveragePoolingProjector) for p in m.projectors)
    assert all(p.output_frame_length == 4 for p in m.projectors)


def test_arch_attntv():
    m = _make_merv("attntv+gelu-mlp")
    assert all(isinstance(p, AttentivePooler) for p in m.projectors)
    assert all(p.num_query_tokens == 4 for p in m.projectors)


def test_arch_frame_factor():
    m = _make_merv("3davg+frame2+linear", fusion="cross_attention_avg_lq", vfl=8)
    # factor 2: output_frames = temporal_resolution(4) // 2 = 2 -> 2*4 = 8 tokens
    assert all(p.output_frame_length == 2 for p in m.projectors)
    assert m.visual_feature_length == 8


def test_arch_non_resampled_linear_single_encoder():
    towers = _make_towers()[:1]
    m = MERV(
        "tiny", towers, tiny_llm_backbone(), arch_specifier="linear", feature_fusion="first",
        projector_token_length=4, visual_feature_length=999, text_embedding_dim=32,
    )
    assert isinstance(m.projectors[0], LinearProjector)
    # single-encoder auto-correction (reference merv.py:195-207)
    assert m.visual_feature_length == towers[0].num_patches


def test_projector_consistency_assert_direct():
    towers = _make_towers()
    with pytest.raises(AssertionError):
        MERV(
            "bad", towers, tiny_llm_backbone(), arch_specifier="no-align+3davg+linear",
            feature_fusion="cross_attention_avg_lq", projector_token_length=4,
            visual_feature_length=999, text_embedding_dim=32,
        )


# ---------------------------------------------------------------------------
# forward / splice semantics (reference merv.py:503-734)
# ---------------------------------------------------------------------------


def test_forward_shapes_and_loss():
    m = _make_merv()
    params = m.init(KEY)
    input_ids, mask, labels, vids = _batch(m)
    out = m.forward(params, input_ids, mask, vids, labels=labels)
    B, T = input_ids.shape
    V = m.visual_feature_length
    assert out["logits"].shape == (B, T + V, m.llm_backbone.decoder_config.vocab_size)
    assert np.isfinite(float(out["loss"]))
    assert out["mixer"].shape == (B, len(m.video_backbones))


def test_chunked_loss_matches_direct():
    """loss_chunk_size streams CE over token blocks (never materializes
    [B, T, vocab] logits) — must agree with the direct loss to fp32 tolerance,
    including non-divisible T (24 tokens, block 7 -> padded tail)."""
    m = _make_merv()
    params = m.init(KEY)
    input_ids, mask, labels, vids = _batch(m)
    direct = m.forward(params, input_ids, mask, vids, labels=labels)
    for block in (4, 7, 64):
        chunked = m.forward(params, input_ids, mask, vids, labels=labels, loss_chunk_size=block)
        assert chunked["logits"] is None
        np.testing.assert_allclose(
            float(chunked["loss"]), float(direct["loss"]), rtol=2e-6, atol=2e-6
        )

    # gradients must agree too (the remat'd block bodies recompute logits)
    def loss(p, chunk):
        return m.forward(p, input_ids, mask, vids, labels=labels, loss_chunk_size=chunk)["loss"]

    g_direct = jax.grad(loss)(params, None)
    g_chunk = jax.grad(loss)(params, 4)
    # the lm_head GEMM runs in bf16 compute dtype on both paths but with
    # different block partitioning, so gradients agree to bf16 ulp (2^-8
    # relative), not fp32 — tolerance set accordingly
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-5),
        g_direct, g_chunk,
    )


def test_splice_after_bos():
    m = _make_merv()
    params = m.init(KEY)
    input_ids, mask, labels, vids = _batch(m)
    feats = m.encode_videos(params, vids)
    visual, _ = m.project_and_fuse(params, feats)
    embeds, fmask, flabels = m.embed_multimodal(params, input_ids, mask, visual, labels)
    V = m.visual_feature_length
    text_embeds = m.llm_backbone.embed_input_ids(params["llm_backbone"], input_ids)
    # BOS embedding first, then visual, then the rest of the text
    np.testing.assert_allclose(np.asarray(embeds[:, 0]), np.asarray(text_embeds[:, 0].astype(embeds.dtype)))
    np.testing.assert_allclose(np.asarray(embeds[:, 1 : 1 + V]), np.asarray(visual.astype(embeds.dtype)))
    np.testing.assert_allclose(np.asarray(embeds[:, 1 + V :]), np.asarray(text_embeds[:, 1:].astype(embeds.dtype)))
    # visual labels all IGNORE; visual mask all True
    assert np.all(np.asarray(flabels[:, 1 : 1 + V]) == IGNORE_INDEX)
    assert np.all(np.asarray(fmask[:, 1 : 1 + V]))


def test_no_bos_splice():
    """qwen-style bos_token_length==0: visual tokens lead (reference merv.py:521)."""
    m = MERV(
        "tiny-nobos", _make_towers(), tiny_llm_backbone(has_bos=False),
        arch_specifier="no-align+3davg+linear", feature_fusion="cross_attention_avg_lq",
        projector_token_length=4, visual_feature_length=16, text_embedding_dim=32,
    )
    params = m.init(KEY)
    input_ids, mask, labels, vids = _batch(m)
    feats = m.encode_videos(params, vids)
    visual, _ = m.project_and_fuse(params, feats)
    embeds, _, _ = m.embed_multimodal(params, input_ids, mask, visual, labels)
    np.testing.assert_allclose(np.asarray(embeds[:, : m.visual_feature_length]), np.asarray(visual.astype(embeds.dtype)))


def test_unimodal_rows_zero_padded_at_end():
    m = _make_merv()
    params = m.init(KEY)
    input_ids, mask, labels, vids = _batch(m)
    is_mm = jnp.asarray([True, False])
    embeds, fmask, flabels = m.embed_multimodal(params, input_ids, mask, m.project_and_fuse(params, m.encode_videos(params, vids))[0], labels, is_mm)
    V, T = m.visual_feature_length, input_ids.shape[1]
    # row 1 (unimodal): trailing V positions are zero-embeds, False mask, IGNORE labels
    np.testing.assert_allclose(np.asarray(embeds[1, T:]), 0.0)
    assert not np.any(np.asarray(fmask[1, T:]))
    assert np.all(np.asarray(flabels[1, T:]) == IGNORE_INDEX)


def test_fusion_modes_forward():
    for fusion in ["first", "concat", "concat_channel", "concat_channel_ln", "scalar"]:
        vfl = 16
        m = _make_merv(fusion=fusion)
        params = m.init(KEY)
        _, _, _, vids = _batch(m)
        feats = m.encode_videos(params, vids)
        fused, _ = m.project_and_fuse(params, feats)
        expect_tokens = vfl * len(m.video_backbones) if fusion == "concat" else vfl
        assert fused.shape == (2, expect_tokens, m.llm_backbone.embed_dim), fusion


# ---------------------------------------------------------------------------
# generation + freezing
# ---------------------------------------------------------------------------


def test_generate_ids_and_text():
    m = _make_merv()
    params = m.init(KEY)
    input_ids, mask, _, vids = _batch(m)
    toks = m.generate_ids(params, input_ids, mask, vids, max_new_tokens=4)
    assert toks.shape == (2, 4)

    video = (np.random.rand(8, 32, 32, 3) * 255).astype(np.uint8)
    text = m.generate(params, video, "In: what?\nOut: ", max_new_tokens=4)
    assert isinstance(text, str)


def test_text_only_generate():
    m = _make_merv()
    params = m.init(KEY)
    text = m.generate(params, None, "In: hello\nOut: ", max_new_tokens=3)
    assert isinstance(text, str)


def test_freeze_stages_and_mask():
    m = _make_merv()
    params = m.init(KEY)
    m.freeze_backbones("align")
    mask = m.trainable_mask(params)
    assert all(jax.tree_util.tree_leaves(mask["projectors"]))
    assert all(jax.tree_util.tree_leaves(mask["feature_fusion"]))
    assert not any(jax.tree_util.tree_leaves(mask["llm_backbone"]))
    assert not any(jax.tree_util.tree_leaves(mask["video_backbones"]))

    m.freeze_backbones("finetune")
    mask = m.trainable_mask(params)
    assert all(jax.tree_util.tree_leaves(mask["llm_backbone"]))
    assert not any(jax.tree_util.tree_leaves(mask["video_backbones"]))

    with pytest.raises(ValueError):
        m.freeze_backbones("bogus-stage")


def test_string2idx_single_tokens():
    m = _make_merv()
    s2i = m.string2idx
    assert set(["True", "False", "Yes", "No", "A", "Z"]).issubset(s2i.keys())
    assert all(isinstance(v, int) for v in s2i.values())


def test_generate_from_jpg_image(tmp_path):
    """A ``.jpg`` path is inflated to a repeated-frame video exactly like the
    reference (merv.py:787-793) — image QA goes through the same multimodal
    forward as video."""
    from PIL import Image

    m = _make_merv()
    params = m.init(KEY)
    img = tmp_path / "frame.jpg"
    Image.fromarray((np.random.rand(40, 44, 3) * 255).astype(np.uint8)).save(img)
    text = m.generate(params, str(img), "In: what?\nOut: ", max_new_tokens=3)
    assert isinstance(text, str)
    # batched path accepts a mix of image path / raw video / text-only
    video = (np.random.rand(8, 32, 32, 3) * 255).astype(np.uint8)
    outs = m.generate_batch(params, [str(img), video, None], ["In: a?\nOut: "] * 3, max_new_tokens=3)
    assert len(outs) == 3 and all(isinstance(o, str) for o in outs)


def test_shared_video_prefix_matches_full():
    """Video-prefix KV caching: one video, many questions — towers + the
    [BOS | visual] prefill run once, yet outputs are token-identical to the
    full per-question pipeline (every MERV eval set is in this regime)."""
    m = _make_merv()
    params = m.init(KEY)
    video = (np.random.RandomState(0).rand(8, 32, 32, 3) * 255).astype(np.uint8)
    prompts = ["In: a?\nOut: ", "In: what is happening here, in detail?\nOut: "]

    full = m.generate_batch(params, [video, video], prompts, max_new_tokens=4)
    shared = m.generate_batch_shared(params, video, prompts, max_new_tokens=4)
    assert shared == full

    # explicit prefix reuse across calls + partial-batch padding slices clean
    pc = m.build_video_prefix(params, video)
    one = m.generate_batch_shared(
        params, video, prompts[:1], max_new_tokens=4, pad_to_batch=2, prefix_cache=pc
    )
    assert one == full[:1]


def test_prompt_length_bucketing_and_batch_padding():
    """Serving compiles one prefill/decode pair per (padded length, batch)
    shape; static buckets + batch padding bound that count. Bucketed/padded
    calls must produce the same text as exact padding (right-pad invariance
    is pinned at the decoder level by test_batched_padded_generation)."""
    m = _make_merv()
    params = m.init(KEY)
    vids = [(np.random.RandomState(0).rand(4, 32, 32, 3) * 255).astype(np.uint8)] * 2
    prompts = ["In: a?\nOut: ", "In: what is happening here, in detail?\nOut: "]

    # width rounds UP to the bucket (not the exact batch max)
    ids_b, _, _, _ = m._prepare_batch_inputs(vids, prompts, length_bucket=1)
    exact_T = ids_b.shape[1]
    ids_a, mask_a, _, _ = m._prepare_batch_inputs(vids, prompts, length_bucket=16)
    assert ids_a.shape[1] == -(-exact_T // 16) * 16 and ids_a.shape[1] % 16 == 0
    assert int(mask_a.sum(1).max()) == exact_T

    exact = m.generate_batch(params, vids, prompts, max_new_tokens=4)
    assert len(exact) == 2
    bucketed = m.generate_batch(params, vids, prompts, max_new_tokens=4, pad_to_batch=4)
    assert bucketed == exact  # padded rows are inert and sliced off

    # partial-group batch padding: padded rows never leak into outputs
    one = m.generate_batch(params, vids[:1], prompts[:1], max_new_tokens=4, pad_to_batch=4)
    assert one == exact[:1]
