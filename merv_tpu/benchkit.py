"""Shared benchmark model builders (the ``bench.py`` harness and every
``scripts/bench_*.py`` construct the same full-size / tiny merv models and
random bf16/int8 parameter trees from here — packaged so the bench scripts
work installed, from any cwd).

The headline harness itself stays at the repo root (``bench.py``, the driver
contract: one JSON line on stdout); it re-exports these builders for
back-compat.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp


def build_model(num_llm_layers: int, tiny: bool = False):
    """The bench model zoo: full-size merv-full (4 towers + Llama-2-7B at
    ``num_llm_layers`` depth) or the tiny 4-tower smoke model.

    ENV: BENCH_TOWERS selects BASELINE configs ("merv" default, "dinov2",
    "siglip+dinov2"); BENCH_TOWER_UNROLL / BENCH_LLM_UNROLL override layer-
    scan unrolls (single int or comma list in tower order).
    """
    from merv_tpu.models.backbones.llm.base_llm import LLMBackbone, LLMSpec, tiny_llm_backbone
    from merv_tpu.models.backbones.llm.prompting import PurePromptBuilder
    from merv_tpu.models.backbones.llm.transformer import LLAMA2_7B
    from merv_tpu.models.materialize import get_video_backbone_and_transform, get_vidlm

    if tiny:
        import dataclasses as dc

        from merv_tpu.models.backbones.video.dinov2_video import DinoV2VideoBackbone
        from merv_tpu.models.backbones.video.vit import tiny_vit_config

        t = tiny_vit_config(num_cls_tokens=1, num_register_tokens=4, use_layerscale=True)
        TinyDino = type("TinyDino", (DinoV2VideoBackbone,), {
            "vit_config": property(lambda self, _t=t: dc.replace(_t)),
        })
        towers = [
            TinyDino("dinov2-video-all-tokens", "resize-naive", default_image_size=32, num_frames=4)
            for _ in range(4)
        ]
        return get_vidlm(
            "merv-bench-tiny", "no-align+3davg+linear", "cross_attention_avg_lq",
            towers, tiny_llm_backbone(), projector_token_length=4, visual_feature_length=16,
        )

    tower_sets = {
        "merv": (
            ["languagebind-video-noclass", "dinov2-video-all-tokens",
             "vivit-google-b-all-no-cls-16frames", "siglip-vit-b16-224px-all-no-cls"],
            [16, 16, 32, 16],
        ),
        "dinov2": (["dinov2-video-all-tokens"], [16]),
        "siglip+dinov2": (["siglip-vit-b16-224px-all-no-cls", "dinov2-video-all-tokens"], [16, 16]),
    }
    ids, frames = tower_sets[os.environ.get("BENCH_TOWERS", "merv")]
    unroll_env = os.environ.get("BENCH_TOWER_UNROLL")
    towers, _ = get_video_backbone_and_transform(
        ids, image_resize_strategy="resize-naive", num_frames=frames,
        scan_unroll=(int(unroll_env) if unroll_env and "," not in unroll_env else None),
    )
    if unroll_env and "," in unroll_env:
        parts = unroll_env.split(",")
        assert len(parts) == len(towers), (
            f"BENCH_TOWER_UNROLL has {len(parts)} entries for {len(towers)} towers"
        )
        for vb, u in zip(towers, parts):
            vb.scan_unroll = int(u)
    cfg = dataclasses.replace(
        LLAMA2_7B, num_layers=num_llm_layers, param_dtype=jnp.bfloat16,
        scan_unroll=int(os.environ.get("BENCH_LLM_UNROLL", "1")),
    )
    spec = LLMSpec("llama2", "__local__/llama2", cfg, PurePromptBuilder, pad_token_id=32000)
    llm = LLMBackbone("llama2-7b-pure", llm_max_length=2048, spec=spec)
    return get_vidlm(
        "merv-full", "3davg+linear", "cross_attention_avg_lq",
        towers, llm, projector_token_length=64, visual_feature_length=1024,
    )


def make_bench_params(shapes, int8: bool = False):
    """Random bf16 params straight from an eval_shape tree; with ``int8`` the
    LLM kernels materialize directly in the quantized layout (int8 + scales) —
    no full-precision transient ever exists in HBM."""
    if os.environ.get("BENCH_PACK", "1") == "1":
        # serving layout: stored-packed qkv + gate/up GEMM kernels
        from merv_tpu.models.backbones.llm.transformer import pack_serving_params

        shapes = dict(shapes)
        shapes["llm_backbone"] = jax.eval_shape(pack_serving_params, shapes["llm_backbone"])
    if int8:
        from merv_tpu.nn.quantization import quantize_tree

        shapes = dict(shapes)
        shapes["llm_backbone"] = jax.eval_shape(quantize_tree, shapes["llm_backbone"])

    @jax.jit
    def make():
        i = 0

        def mk(s):
            nonlocal i
            i += 1
            key = jax.random.PRNGKey(i)
            if s.dtype == jnp.int8:
                return jax.random.randint(key, s.shape, -127, 127, jnp.int8)
            if jnp.issubdtype(s.dtype, jnp.floating):
                return (jax.random.normal(key, s.shape, jnp.float32) * 0.02).astype(jnp.bfloat16)
            return jnp.zeros(s.shape, s.dtype)

        return jax.tree_util.tree_map(mk, shapes)

    return make()
