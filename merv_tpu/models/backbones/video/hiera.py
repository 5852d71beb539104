"""Hiera video backbone (hierarchical ViT with mask-unit attention).

Capability parity with reference ``merv/models/backbones/video/hiera.py``:
``facebook/hiera_{base,base_plus,large}_16x224`` video models; frames are
grouped into clips of 16 (``hiera.py:113-117``), the feature tap is the last
intermediate (final-stage output, pre-norm, spatially re-rolled), and
``embed_dim`` scales by ``2**q_pool`` (``hiera.py:129-136``).

Architecture re-implemented functionally from the public Hiera design
(arXiv:2306.00989; the reference consumes the ``hiera-transformer`` pip
package): 3D conv patch embed (k 3x7x7, s 2x4x4) -> separable pos embed ->
four stages with channel doubling, query max-pooling between stages
(q_stride 1x2x2, q_pool=3), mask-unit local attention in the early stages and
global attention later.

TPU-native notes:
- the "unroll" token reordering (mask units contiguous) is a static
  reshape/transpose chain — XLA folds it into the surrounding ops;
- mask-unit attention over 64-token windows runs as batched dense attention
  [B*W, 64, D] einsums (far below flash-kernel crossover);
- stages have heterogeneous widths, so layers run as an unrolled Python loop
  (24 blocks) rather than lax.scan — each block is a handful of GEMMs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from merv_tpu.models.backbones.video.base_video import VideoBackbone
from merv_tpu.models.backbones.video.vit import ViTConfig
from merv_tpu.nn.core import LayerNorm, Linear, gelu, trunc_normal_init
from merv_tpu.preprocessing.transforms import HIERA_MEAN, HIERA_STD, VideoTransform

Array = jax.Array
PyTree = Any


@dataclass(frozen=True)
class HieraConfig:
    input_size: Tuple[int, int, int] = (16, 224, 224)  # (T, H, W)
    patch_kernel: Tuple[int, int, int] = (3, 7, 7)
    patch_stride: Tuple[int, int, int] = (2, 4, 4)
    patch_padding: Tuple[int, int, int] = (1, 3, 3)
    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (2, 3, 16, 3)
    q_pool: int = 3
    q_stride: Tuple[int, int, int] = (1, 2, 2)
    mask_unit_size: Tuple[int, int, int] = (1, 8, 8)
    mask_unit_attn: Tuple[bool, ...] = (True, True, False, False)
    dim_mul: float = 2.0
    head_mul: float = 2.0
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def tokens_shape(self) -> Tuple[int, int, int]:
        return tuple(i // s for i, s in zip(self.input_size, self.patch_stride))  # type: ignore[return-value]

    @property
    def num_tokens(self) -> int:
        return int(np.prod(self.tokens_shape))

    @property
    def final_dim(self) -> int:
        return int(self.embed_dim * self.dim_mul ** (len(self.stages) - 1))

    @property
    def flat_mu_size(self) -> int:
        return int(np.prod(self.mask_unit_size))

    @property
    def flat_q_stride(self) -> int:
        return int(np.prod(self.q_stride))

    def layer_plan(self) -> List[Dict[str, Any]]:
        """Flat per-layer config: dims, heads, query stride, window, MU attn."""
        cumulative = np.cumsum(self.stages).tolist()
        pool_layers = set(cumulative[: self.q_pool])
        plan: List[Dict[str, Any]] = []
        dim_in = self.embed_dim
        total = sum(self.stages)
        for i in range(total):
            stage_idx = next(s for s, c in enumerate(cumulative) if i < c)
            dim_out = int(self.embed_dim * self.dim_mul**stage_idx)
            heads = int(self.num_heads * self.head_mul**stage_idx)
            window = int(self.flat_mu_size * self.flat_q_stride**-stage_idx)
            first_of_stage = i == ([0] + cumulative)[stage_idx]
            use_mu = self.mask_unit_attn[stage_idx] or (
                first_of_stage and stage_idx > 0 and self.mask_unit_attn[stage_idx - 1]
            )
            plan.append(
                dict(
                    dim_in=dim_in, dim_out=dim_out, heads=heads,
                    q_stride=self.flat_q_stride if i in pool_layers else 1,
                    window=window, use_mu=use_mu,
                )
            )
            dim_in = dim_out
        return plan


# registered checkpoints (reference hiera.py:22-29)
HIERA_CONFIGS: Dict[str, HieraConfig] = {
    "hiera_base_16x224": HieraConfig(embed_dim=96, num_heads=1, stages=(2, 3, 16, 3)),
    "hiera_base_plus_16x224": HieraConfig(embed_dim=112, num_heads=2, stages=(2, 3, 16, 3)),
    "hiera_large_16x224": HieraConfig(embed_dim=144, num_heads=2, stages=(2, 6, 36, 4)),
}

HIERA_VIDEO_BACKBONES = {
    "hiera-base-video": "facebook/hiera_base_16x224.mae_k400_ft_k400",
    "hiera-base-video-noft": "facebook/hiera_base_16x224.mae_k400",
    "hiera-base-plus-video": "facebook/hiera_base_plus_16x224.mae_k400_ft_k400",
    "hiera-base-plus-video-noft": "facebook/hiera_base_plus_16x224.mae_k400",
    "hiera-large-video": "facebook/hiera_large_16x224.mae_k400_ft_k400",
    "hiera-large-video-noft": "facebook/hiera_large_16x224.mae_k400",
}


def _unroll(x: Array, size: Sequence[int], schedule: Sequence[Sequence[int]]) -> Array:
    """Reorder tokens so stride blocks lead the token dim (mask units contiguous).

    x: [B, prod(size), C] in (t, h, w) order -> [B, prod(size), C] unrolled.
    """
    B, _, C = x.shape
    cur = list(size)
    x = x.reshape(B, *cur, C)
    batch = B
    for strides in schedule:
        cur = [i // s for i, s in zip(cur, strides)]
        shape = [batch] + [v for pair in zip(cur, strides) for v in pair] + [C]
        x = x.reshape(shape)
        n = len(shape)
        perm = [0] + list(range(2, n - 1, 2)) + list(range(1, n - 1, 2)) + [n - 1]
        x = x.transpose(perm)
        x = x.reshape(batch * int(np.prod([s for s in strides])), *cur, C)
        batch *= int(np.prod([s for s in strides]))
    return x.reshape(B, int(np.prod(size)), C)


def _reroll(x: Array, size: Sequence[int], schedule: Sequence[Sequence[int]]) -> Array:
    """Inverse of _unroll for a given remaining schedule -> [B, *size', C] spatial order."""
    B, seq, C = x.shape
    nd = len(size)
    mu_shape = [1] * nd
    for strides in schedule:
        sp = int(np.prod(list(strides)))
        x = x.reshape(B, *strides, seq // sp, *mu_shape, C)
        # [B, s..., N, m...] -> [B, N, interleaved(s_i, m_i)..., C]
        perm = [0, nd + 1]
        for i in range(nd):
            perm += [1 + i, nd + 2 + i]
        perm += [2 * nd + 2]
        x = x.transpose(perm)
        mu_shape = [m * s for m, s in zip(mu_shape, strides)]
        x = x.reshape(B, -1, *mu_shape, C)
        seq = x.shape[1]
    # [B, num_mu, *mu_shape, C] -> [B, *size, C]
    num_mu = [s // m for s, m in zip(size, mu_shape)]
    x = x.reshape(B, *num_mu, *mu_shape, C)
    perm = [0]
    for i in range(nd):
        perm += [1 + i, 1 + nd + i]
    perm += [1 + 2 * nd]
    x = x.transpose(perm)
    return x.reshape(B, *size, C)


@dataclass(frozen=True)
class HieraModel:
    cfg: HieraConfig

    # -- init --------------------------------------------------------------------

    def init(self, key: Array) -> PyTree:
        c = self.cfg
        init02 = trunc_normal_init(0.02)
        plan = c.layer_plan()
        keys = jax.random.split(key, len(plan) + 3)
        t, h, w = c.tokens_shape
        patch_in = int(np.prod(c.patch_kernel)) * 3
        params: Dict[str, Any] = {
            "patch_embed": {
                "kernel": init02(keys[0], (c.embed_dim, 3, *c.patch_kernel), c.param_dtype),
                "bias": jnp.zeros((c.embed_dim,), c.param_dtype),
            },
            "pos_embed_spatial": init02(keys[1], (h * w, c.embed_dim), c.param_dtype),
            "pos_embed_temporal": init02(keys[2], (t, c.embed_dim), c.param_dtype),
            "blocks": {},
        }
        ln = lambda d: LayerNorm(d, eps=c.layer_norm_eps, param_dtype=c.param_dtype)  # noqa: E731
        for i, lp in enumerate(plan):
            ks = jax.random.split(keys[3 + i], 5)
            lin = lambda a, b, k: Linear(a, b, param_dtype=c.param_dtype, kernel_init=init02).init(k)  # noqa: E731
            hidden = int(lp["dim_out"] * c.mlp_ratio)
            blk: Dict[str, Any] = {
                "norm1": ln(lp["dim_in"]).init(ks[0]),
                "attn": {"qkv": lin(lp["dim_in"], 3 * lp["dim_out"], ks[0]), "proj": lin(lp["dim_out"], lp["dim_out"], ks[1])},
                "norm2": ln(lp["dim_out"]).init(ks[2]),
                "mlp": {"fc1": lin(lp["dim_out"], hidden, ks[2]), "fc2": lin(hidden, lp["dim_out"], ks[3])},
            }
            if lp["dim_in"] != lp["dim_out"]:
                blk["proj"] = lin(lp["dim_in"], lp["dim_out"], ks[4])
            params["blocks"][str(i)] = blk
        return params

    # -- forward -----------------------------------------------------------------

    def _patch_embed(self, params: PyTree, pixels: Array) -> Array:
        """[B, C, T, H, W] -> [B, t*h*w, D] (t,h,w spatial order)."""
        c = self.cfg
        y = jax.lax.conv_general_dilated(
            pixels.astype(c.compute_dtype),
            params["patch_embed"]["kernel"].astype(c.compute_dtype),
            window_strides=c.patch_stride,
            padding=[(p, p) for p in c.patch_padding],
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )
        y = y + params["patch_embed"]["bias"].astype(y.dtype)[None, :, None, None, None]
        B, D = y.shape[0], y.shape[1]
        return y.reshape(B, D, -1).transpose(0, 2, 1)

    def _pos_embed(self, params: PyTree, x: Array) -> Array:
        c = self.cfg
        t, h, w = c.tokens_shape
        spatial = jnp.tile(params["pos_embed_spatial"].astype(x.dtype), (t, 1))
        temporal = jnp.repeat(params["pos_embed_temporal"].astype(x.dtype), h * w, axis=0)
        return x + (spatial + temporal)[None]

    def _attention(self, blk: PyTree, x: Array, lp: Dict[str, Any]) -> Array:
        """Mask-unit / global attention with query pooling (token order unrolled)."""
        c = self.cfg
        B, N, _ = x.shape
        d_out, heads, qs = lp["dim_out"], lp["heads"], lp["q_stride"]
        hd = d_out // heads
        num_windows = N // (qs * lp["window"]) if lp["use_mu"] else 1

        qkv = Linear(lp["dim_in"], 3 * d_out, param_dtype=c.param_dtype)(blk["attn"]["qkv"], x)
        qkv = qkv.reshape(B, N // num_windows, num_windows, 3, heads, hd)
        qkv = qkv.transpose(3, 0, 4, 2, 1, 5)  # [3, B, heads, windows, tokens, hd]
        q, k, v = qkv[0], qkv[1], qkv[2]

        if qs > 1:
            q = q.reshape(B, heads, num_windows, qs, -1, hd).max(axis=3)

        logits = jnp.einsum("bhwqd,bhwkd->bhwqk", q, k, preferred_element_type=jnp.float32) * (hd**-0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhwqk,bhwkd->bhwqd", probs, v)
        # [B, heads, windows, tokens, hd] -> [B, tokens*windows, d_out] (token-major)
        out = out.transpose(0, 3, 2, 1, 4).reshape(B, -1, d_out)
        return Linear(d_out, d_out, param_dtype=c.param_dtype)(blk["attn"]["proj"], out)

    def _block(self, blk: PyTree, x: Array, lp: Dict[str, Any]) -> Array:
        c = self.cfg
        normed = LayerNorm(lp["dim_in"], eps=c.layer_norm_eps, param_dtype=c.param_dtype)(blk["norm1"], x)
        if lp["dim_in"] != lp["dim_out"]:
            x = Linear(lp["dim_in"], lp["dim_out"], param_dtype=c.param_dtype)(blk["proj"], normed)
            if lp["q_stride"] > 1:
                x = x.reshape(x.shape[0], lp["q_stride"], -1, lp["dim_out"]).max(axis=1)
        elif lp["q_stride"] > 1:
            x = x.reshape(x.shape[0], lp["q_stride"], -1, lp["dim_out"]).max(axis=1)
        x = x + self._attention(blk, normed, lp)

        h = LayerNorm(lp["dim_out"], eps=c.layer_norm_eps, param_dtype=c.param_dtype)(blk["norm2"], x)
        hidden = int(lp["dim_out"] * c.mlp_ratio)
        h = Linear(lp["dim_out"], hidden, param_dtype=c.param_dtype)(blk["mlp"]["fc1"], h)
        h = gelu(h)
        h = Linear(hidden, lp["dim_out"], param_dtype=c.param_dtype)(blk["mlp"]["fc2"], h)
        return x + h

    def __call__(self, params: PyTree, pixels: Array) -> Array:
        """pixels: [B, C, T, H, W] -> last-stage features [B, t', h', w', C'] flattened.

        Matches ``Hiera.forward(return_intermediates=True)[1][-1]`` (pre-norm
        final-stage output, spatially re-rolled).
        """
        c = self.cfg
        x = self._patch_embed(params, pixels)
        x = self._pos_embed(params, x)
        schedule = [list(c.q_stride)] * (len(c.stages) - 1)
        x = _unroll(x, c.tokens_shape, schedule)

        for i, lp in enumerate(c.layer_plan()):
            x = self._block(params["blocks"][str(i)], x, lp)

        # final stage: all unroll strides consumed -> tokens already spatial
        t, h, w = c.tokens_shape
        qt = [t // (c.q_stride[0] ** c.q_pool), h // (c.q_stride[1] ** c.q_pool), w // (c.q_stride[2] ** c.q_pool)]
        assert x.shape[1] == int(np.prod(qt)), (x.shape, qt)
        return x.reshape(x.shape[0], -1, c.final_dim)


# ---------------------------------------------------------------------------
# Weight import from the facebook/hiera_* checkpoint layout
# ---------------------------------------------------------------------------


def import_hiera_state_dict(cfg: HieraConfig, state: Mapping[str, Any], param_dtype: Any = jnp.bfloat16) -> PyTree:
    """Map an original-hiera state dict (``blocks.{i}.*``) to our pytree."""

    def get(k: str) -> np.ndarray:
        t = state[k]
        if hasattr(t, "detach"):
            t = t.detach().float().numpy()
        return np.asarray(t, np.float32)

    def lin(k: str) -> Dict[str, np.ndarray]:
        return {"kernel": np.ascontiguousarray(get(f"{k}.weight").T), "bias": get(f"{k}.bias")}

    def ln(k: str) -> Dict[str, np.ndarray]:
        return {"scale": get(f"{k}.weight"), "bias": get(f"{k}.bias")}

    params: Dict[str, Any] = {
        "patch_embed": {"kernel": get("patch_embed.proj.weight"), "bias": get("patch_embed.proj.bias")},
        "pos_embed_spatial": get("pos_embed_spatial")[0],
        "pos_embed_temporal": get("pos_embed_temporal")[0],
        "blocks": {},
    }
    for i, lp in enumerate(cfg.layer_plan()):
        blk = {
            "norm1": ln(f"blocks.{i}.norm1"),
            "attn": {"qkv": lin(f"blocks.{i}.attn.qkv"), "proj": lin(f"blocks.{i}.attn.proj")},
            "norm2": ln(f"blocks.{i}.norm2"),
            "mlp": {"fc1": lin(f"blocks.{i}.mlp.fc1"), "fc2": lin(f"blocks.{i}.mlp.fc2")},
        }
        if lp["dim_in"] != lp["dim_out"]:
            blk["proj"] = lin(f"blocks.{i}.proj")
        params["blocks"][str(i)] = blk
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, param_dtype), params)


# ---------------------------------------------------------------------------
# Backbone wrapper
# ---------------------------------------------------------------------------


class HieraVideoBackbone(VideoBackbone):
    def __init__(
        self, video_backbone_id: str, image_resize_strategy: str, default_image_size: int = 224, num_frames: int = 16
    ) -> None:
        super().__init__(video_backbone_id, image_resize_strategy, default_image_size, num_frames)
        assert video_backbone_id in HIERA_VIDEO_BACKBONES, video_backbone_id
        self.huggingface_path = HIERA_VIDEO_BACKBONES[video_backbone_id]
        arch = self.huggingface_path.split("/")[-1].split(".")[0]
        self.hiera_config = HIERA_CONFIGS[arch]
        assert num_frames % 16 == 0, "Hiera processes clips of 16 frames (reference hiera.py:115)"
        self.video_transform = VideoTransform(
            target_size=default_image_size,
            resize_strategy=image_resize_strategy,
            shortest_edge=256,
            interpolation="bilinear",
            mean=HIERA_MEAN,
            std=HIERA_STD,
        )

    @property
    def model(self) -> HieraModel:
        return HieraModel(self.hiera_config)

    # Hiera is not a flat ViT — override the ViT-specific plumbing
    @property
    def vit_config(self) -> ViTConfig:  # pragma: no cover - not applicable
        raise NotImplementedError("Hiera uses HieraModel, not the generic ViT")

    def init(self, key: Array) -> PyTree:
        return self.model.init(key)

    def load_state_dict(self, state: Mapping[str, Any], param_dtype: Any = jnp.bfloat16) -> PyTree:
        return import_hiera_state_dict(self.hiera_config, state, param_dtype)

    def __call__(self, params: PyTree, video_values: Array, is_image: Optional[Array] = None) -> Array:
        """video_values: [B, F, C, H, W] -> [B, num_patches, embed_dim].

        Frames regrouped into 16-frame clips (reference hiera.py:113-117).
        """
        B, F, C, H, W = video_values.shape
        clips = video_values.reshape(B * (F // 16), 16, C, H, W).transpose(0, 2, 1, 3, 4)
        feats = self.model(params, clips)
        return feats.reshape(B, -1, self.embed_dim)

    @property
    def default_video_resolution(self) -> Tuple[int, int, int, int]:
        return (self.num_frames, 3, self.default_image_size, self.default_image_size)

    @property
    def embed_dim(self) -> int:
        return int(self.hiera_config.embed_dim * 2**self.hiera_config.q_pool)

    @property
    def num_patches(self) -> int:
        c = self.hiera_config
        t, h, w = (self.num_frames // c.patch_stride[0], self.default_image_size // c.patch_stride[1],
                   self.default_image_size // c.patch_stride[2])
        q = c.q_pool
        assert h % 2**q == 0 and w % 2**q == 0
        return t * h * w // 2 ** (2 * q)

    @property
    def spatial_resolution(self) -> int:
        c = self.hiera_config
        h = self.default_image_size // c.patch_stride[1]
        w = self.default_image_size // c.patch_stride[2]
        return h * w // 2 ** (2 * c.q_pool)
