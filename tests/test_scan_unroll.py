"""Layer-scan unroll knobs are schedule-only and stage-keyed (torch-free).

These pins back BASELINE.md's "numerics are identical at any unroll" claim
and the v5e-8 memory fit's per-stage unroll selection — they must run even
in torch-free environments (test_vit.py's importorskip would skip them).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from merv_tpu.models.backbones.video.vit import VisionTransformer, ViTConfig, tiny_vit_config


def test_scan_unroll_is_schedule_only():
    """unroll is a scheduling knob: any unroll factor must be numerically
    IDENTICAL to the scanned form (BASELINE.md claims this for the serving
    default 12 vs the training override 4)."""
    cfg = tiny_vit_config(num_layers=6, scan_unroll=1)
    vit = VisionTransformer(cfg)
    params = vit.init(jax.random.PRNGKey(0))
    px = jnp.asarray(np.random.RandomState(7).randn(2, 3, 32, 32).astype(np.float32))
    ref = np.asarray(vit(params, px))
    for unroll in (2, 3, 6):
        v = VisionTransformer(dataclasses.replace(cfg, scan_unroll=unroll))
        np.testing.assert_array_equal(np.asarray(v(params, px)), ref)


def test_llm_scan_unroll_is_schedule_only():
    """Same pin for the LLM no-cache layer scan (DecoderConfig.scan_unroll).

    fp32 compute is BIT-identical at any unroll (same math, same order). At
    the production bf16 compute dtype, CPU XLA places the bf16<->fp32
    converts differently across fusion boundaries when unrolled, so bf16
    CPU outputs may differ by 1 bf16 ulp — bounded here at one ulp of the
    observed scale (the TPU backend computes identical fused programs)."""
    from merv_tpu.models.backbones.llm.transformer import LlamaDecoder, tiny_decoder_config

    ids = jnp.asarray(np.random.RandomState(3).randint(2, 64, (2, 12)), jnp.int32)

    cfg32 = tiny_decoder_config(num_layers=4, compute_dtype=jnp.float32)
    dec = LlamaDecoder(dataclasses.replace(cfg32, scan_unroll=1))
    params = dec.init(jax.random.PRNGKey(0))
    ref, _ = dec(params, input_ids=ids)
    for unroll in (2, 4):
        out, _ = LlamaDecoder(dataclasses.replace(cfg32, scan_unroll=unroll))(params, input_ids=ids)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    cfg16 = tiny_decoder_config(num_layers=4)  # bf16 compute (production)
    ref16, _ = LlamaDecoder(dataclasses.replace(cfg16, scan_unroll=1))(params, input_ids=ids)
    for unroll in (2, 4):
        out16, _ = LlamaDecoder(dataclasses.replace(cfg16, scan_unroll=unroll))(params, input_ids=ids)
        np.testing.assert_allclose(
            np.asarray(out16, np.float32), np.asarray(ref16, np.float32), atol=2e-3
        )


def test_backbone_scan_unroll_override():
    """VideoBackbone.scan_unroll (set by training materialize) must reach the
    ViT config; serving leaves the tuned default in place."""
    from merv_tpu.models.materialize import (
        TRAIN_TOWER_SCAN_UNROLL,
        TRAIN_TOWER_SCAN_UNROLL_ALIGN,
        get_video_backbone_and_transform,
        train_tower_scan_unroll,
    )

    # per-stage choice keys on what TRAINS, not the stage-name suffix: the
    # LLM-frozen stages fit v5e-8 at the fast factor; every LLM-training
    # stage — including "full-align", whose name ends in "align" — takes the
    # memory-proven finetune factor (memory_proof: 18.26 GiB at 12 vs 15.88
    # at 4 when the LLM gradient step is live).
    assert train_tower_scan_unroll("align") == TRAIN_TOWER_SCAN_UNROLL_ALIGN
    assert train_tower_scan_unroll("second_align") == TRAIN_TOWER_SCAN_UNROLL_ALIGN
    assert train_tower_scan_unroll("finetune") == TRAIN_TOWER_SCAN_UNROLL
    assert train_tower_scan_unroll("full-align") == TRAIN_TOWER_SCAN_UNROLL
    assert train_tower_scan_unroll("second_finetune") == TRAIN_TOWER_SCAN_UNROLL
    assert train_tower_scan_unroll("full-finetune") == TRAIN_TOWER_SCAN_UNROLL

    (vb,), _ = get_video_backbone_and_transform(
        ["dinov2-video-all-tokens"], "resize-naive", [16], scan_unroll=TRAIN_TOWER_SCAN_UNROLL
    )
    assert vb.vit.cfg.scan_unroll == TRAIN_TOWER_SCAN_UNROLL
    (vb2,), _ = get_video_backbone_and_transform(["dinov2-video-all-tokens"], "resize-naive", [16])
    assert vb2.vit.cfg.scan_unroll == ViTConfig.scan_unroll


def test_remat_with_cache_fails_loudly():
    """remat=True + kv_cache must raise, not silently skip checkpointing
    (the cached layer scan's in-place carry aliasing excludes remat)."""
    import pytest

    from merv_tpu.models.backbones.llm.transformer import KVCache, LlamaDecoder, tiny_decoder_config

    cfg = tiny_decoder_config(num_layers=2)
    dec = LlamaDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))
    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    ids = jnp.ones((1, 4), jnp.int32)
    with pytest.raises(ValueError, match="remat"):
        dec(params, input_ids=ids, kv_cache=cache, remat=True)
