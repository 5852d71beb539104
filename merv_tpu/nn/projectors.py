"""Projection modules: per-encoder vision→LLM token resamplers.

Capability parity with the reference projector zoo
(reference ``merv/util/nn_utils.py:22-377``): every module maps
``[..., vision_dim] -> [..., llm_dim]``; the token-resampling family
(``TokenResampler``) additionally reshapes ``[B, F, N, C]`` frame-token grids
down to ``output_frame_length x output_token_length`` tokens.

TPU-native design notes:
- torch ``AdaptiveAvgPool2d/3d`` becomes a *static pooling matrix* contraction:
  for fixed (in, out) sizes the adaptive-pool weights are a constant
  ``[out, in]`` matrix (rows = the exact torch window ``floor(i*In/Out) ..
  ceil((i+1)*In/Out)`` averages), so pooling compiles to einsum/GEMMs on the
  MXU instead of gather loops — bitwise-equal to torch for every size combo.
- convs use ``lax.conv_general_dilated`` in NCHW/NCDHW to match torch layouts
  for weight import.
- all modules follow the functional pattern of :mod:`merv_tpu.nn.core`
  (frozen dataclass config + ``init``/``__call__`` over a parameter pytree).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from merv_tpu.nn.core import (
    LayerNorm,
    Linear,
    Module,
    gelu,
    kaiming_uniform,
    trunc_normal_init,
    zeros_init,
)
from merv_tpu.ops.attention import attention

Array = jax.Array
PyTree = Any


# ---------------------------------------------------------------------------
# Adaptive pooling as a static matrix contraction
# ---------------------------------------------------------------------------


def adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] averaging matrix reproducing torch AdaptiveAvgPool windows.

    torch window for output index i: start = floor(i*In/Out), end = ceil((i+1)*In/Out).
    """
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil div
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool_2d(x: Array, out_hw: Tuple[int, int]) -> Array:
    """x: [..., H, W, C] -> [..., oh, ow, C] (channels-last for clean einsum)."""
    H, W = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(adaptive_pool_matrix(H, out_hw[0]), x.dtype)
    mw = jnp.asarray(adaptive_pool_matrix(W, out_hw[1]), x.dtype)
    x = jnp.einsum("...hwc,oh->...owc", x, mh)
    x = jnp.einsum("...owc,pw->...opc", x, mw)
    return x


def adaptive_avg_pool_3d(x: Array, out_thw: Tuple[int, int, int]) -> Array:
    """x: [..., T, H, W, C] -> [..., ot, oh, ow, C]."""
    T, H, W = x.shape[-4], x.shape[-3], x.shape[-2]
    mt = jnp.asarray(adaptive_pool_matrix(T, out_thw[0]), x.dtype)
    mh = jnp.asarray(adaptive_pool_matrix(H, out_thw[1]), x.dtype)
    mw = jnp.asarray(adaptive_pool_matrix(W, out_thw[2]), x.dtype)
    x = jnp.einsum("...thwc,ot->...ohwc", x, mt)
    x = jnp.einsum("...ohwc,ph->...opwc", x, mh)
    x = jnp.einsum("...opwc,qw->...opqc", x, mw)
    return x


# ---------------------------------------------------------------------------
# MLP projector family (reference nn_utils.py:22-121)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Identity(Module):
    def init(self, key: Array) -> PyTree:
        del key
        return {}

    def __call__(self, params: PyTree, x: Array) -> Array:
        del params
        return x


@dataclass(frozen=True)
class LinearProjector(Module):
    vision_dim: int
    llm_dim: int
    pre_proj_layernorm: bool = False
    param_dtype: Any = jnp.float32

    def init(self, key: Array) -> PyTree:
        p = {"projector": Linear(self.vision_dim, self.llm_dim, param_dtype=self.param_dtype).init(key)}
        if self.pre_proj_layernorm:
            p["layernorm"] = LayerNorm(self.vision_dim, param_dtype=self.param_dtype).init(key)
        return p

    def __call__(self, params: PyTree, x: Array) -> Array:
        if self.pre_proj_layernorm:
            x = LayerNorm(self.vision_dim, param_dtype=self.param_dtype)(params["layernorm"], x)
        return Linear(self.vision_dim, self.llm_dim, param_dtype=self.param_dtype)(params["projector"], x)

    @property
    def output_token_length(self) -> int:
        return 1


@dataclass(frozen=True)
class MLPProjector(Module):
    """2-layer GELU MLP (reference "gelu-mlp")."""

    vision_dim: int
    llm_dim: int
    pre_proj_layernorm: bool = False
    param_dtype: Any = jnp.float32

    def _dims(self) -> Tuple[Tuple[int, int], ...]:
        return ((self.vision_dim, self.llm_dim), (self.llm_dim, self.llm_dim))

    def init(self, key: Array) -> PyTree:
        keys = jax.random.split(key, len(self._dims()) + 1)
        p = {
            "projector": {
                str(i): Linear(d_in, d_out, param_dtype=self.param_dtype).init(keys[i])
                for i, (d_in, d_out) in enumerate(self._dims())
            }
        }
        if self.pre_proj_layernorm:
            p["layernorm"] = LayerNorm(self.vision_dim, param_dtype=self.param_dtype).init(keys[-1])
        return p

    def __call__(self, params: PyTree, x: Array) -> Array:
        if self.pre_proj_layernorm:
            x = LayerNorm(self.vision_dim, param_dtype=self.param_dtype)(params["layernorm"], x)
        dims = self._dims()
        for i, (d_in, d_out) in enumerate(dims):
            x = Linear(d_in, d_out, param_dtype=self.param_dtype)(params["projector"][str(i)], x)
            if i < len(dims) - 1:
                x = gelu(x)
        return x

    @property
    def output_token_length(self) -> int:
        return 1


@dataclass(frozen=True)
class MLPDeepProjector(MLPProjector):
    """3-layer GELU MLP (reference nn_utils.py:62-84)."""

    def _dims(self) -> Tuple[Tuple[int, int], ...]:
        return (
            (self.vision_dim, self.llm_dim),
            (self.llm_dim, self.llm_dim),
            (self.llm_dim, self.llm_dim),
        )


@dataclass(frozen=True)
class FusedMLPProjector(MLPProjector):
    """4x-widened first projection (reference "fused-gelu-mlp", nn_utils.py:87-108)."""

    def _dims(self) -> Tuple[Tuple[int, int], ...]:
        wide = self.vision_dim * 4
        return ((self.vision_dim, wide), (wide, self.llm_dim), (self.llm_dim, self.llm_dim))


def get_mlp_projector(fused_vision_dim: int, llm_dim: int, mlp_type: str = "gelu-mlp") -> Module:
    """Selector parity with reference nn_utils.py:111-121."""
    if mlp_type == "linear":
        return LinearProjector(fused_vision_dim, llm_dim)
    if mlp_type == "gelu-mlp":
        return MLPProjector(fused_vision_dim, llm_dim)
    if mlp_type == "fused-gelu-mlp":
        return FusedMLPProjector(fused_vision_dim, llm_dim)
    if mlp_type == "none":
        return Identity()
    raise ValueError(f"Projector with mlp_type = {mlp_type!r} is not supported!")


# ---------------------------------------------------------------------------
# Token resamplers (reference nn_utils.py:124-377)
# ---------------------------------------------------------------------------


class TokenResampler(Module):
    """Resamples token length; exposes the resulting grid size."""

    @property
    def output_token_length(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    @property
    def output_frame_length(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError


@dataclass(frozen=True)
class AveragePoolingProjector(TokenResampler):
    """Per-frame adaptive avg-pool to output_size^2 tokens + MLP (Emu-2 style,
    reference nn_utils.py:136-174)."""

    vision_dim: int
    llm_dim: int
    output_size: int
    output_frames: int = 8
    mlp_type: str = "gelu-mlp"

    @property
    def projector(self) -> Module:
        return get_mlp_projector(self.vision_dim, self.llm_dim, self.mlp_type)

    def init(self, key: Array) -> PyTree:
        return {"projector": self.projector.init(key)}

    def __call__(self, params: PyTree, x: Array) -> Array:
        """x: [B, F, N, C] -> [B, F*S*S, llm_dim]."""
        B, F, N, C = x.shape
        assert F == self.output_frames, (F, self.output_frames)
        H = int(math.isqrt(N))
        x = x.reshape(B, F, H, H, C)
        x = adaptive_avg_pool_2d(x, (self.output_size, self.output_size))
        x = x.reshape(B, F, self.output_size * self.output_size, C)
        x = self.projector(params["projector"], x)
        return x.reshape(B, F * self.output_size * self.output_size, -1)

    @property
    def output_token_length(self) -> int:
        return self.output_size**2

    @property
    def output_frame_length(self) -> int:
        return self.output_frames


@dataclass(frozen=True)
class CrossAttentionBlock(Module):
    """JEPA-style cross-attention block (reference nn_utils.py:380-451):
    q + xattn(q, norm1(x)); q + mlp(norm2(q))."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    param_dtype: Any = jnp.float32

    def init(self, key: Array) -> PyTree:
        ks = jax.random.split(key, 6)
        init02 = trunc_normal_init(0.02)
        lin = lambda i, o, b=True: Linear(i, o, use_bias=b, param_dtype=self.param_dtype, kernel_init=init02)  # noqa: E731
        hidden = int(self.dim * self.mlp_ratio)
        p = {
            "norm1": LayerNorm(self.dim, param_dtype=self.param_dtype).init(ks[0]),
            "norm2": LayerNorm(self.dim, param_dtype=self.param_dtype).init(ks[0]),
            "xattn": {
                "q": lin(self.dim, self.dim, self.qkv_bias).init(ks[1]),
                "kv": lin(self.dim, 2 * self.dim, self.qkv_bias).init(ks[2]),
                # proj rescaled by 1/sqrt(2) (reference _rescale_blocks, layer_id=1)
                "proj": lin(self.dim, self.dim).init(ks[3]),
            },
            "mlp": {
                "fc1": lin(self.dim, hidden).init(ks[4]),
                "fc2": lin(hidden, self.dim).init(ks[5]),
            },
        }
        scale = 1.0 / math.sqrt(2.0)
        p["xattn"]["proj"]["kernel"] = p["xattn"]["proj"]["kernel"] * scale
        p["mlp"]["fc2"]["kernel"] = p["mlp"]["fc2"]["kernel"] * scale
        # linear biases init to 0 (reference _init_weights)
        for node in (p["xattn"]["q"], p["xattn"]["kv"], p["xattn"]["proj"], p["mlp"]["fc1"], p["mlp"]["fc2"]):
            if "bias" in node:
                node["bias"] = jnp.zeros_like(node["bias"])
        return p

    def _xattn(self, params: PyTree, q: Array, x: Array) -> Array:
        d, h = self.dim, self.num_heads
        hd = d // h
        B, n, _ = q.shape
        N = x.shape[1]
        lin_q = Linear(d, d, use_bias=self.qkv_bias, param_dtype=self.param_dtype)
        lin_kv = Linear(d, 2 * d, use_bias=self.qkv_bias, param_dtype=self.param_dtype)
        qh = lin_q(params["q"], q).reshape(B, n, h, hd).transpose(0, 2, 1, 3)
        kv = lin_kv(params["kv"], x).reshape(B, N, 2, h, hd)
        kh = kv[:, :, 0].transpose(0, 2, 1, 3)
        vh = kv[:, :, 1].transpose(0, 2, 1, 3)
        out = attention(qh, kh, vh, causal=False)
        out = out.transpose(0, 2, 1, 3).reshape(B, n, d)
        return Linear(d, d, param_dtype=self.param_dtype)(params["proj"], out)

    def __call__(self, params: PyTree, q: Array, x: Array) -> Array:
        ln = LayerNorm(self.dim, param_dtype=self.param_dtype)
        hidden = int(self.dim * self.mlp_ratio)
        q = q + self._xattn(params["xattn"], q, ln(params["norm1"], x))
        y = ln(params["norm2"], q)
        y = Linear(self.dim, hidden, param_dtype=self.param_dtype)(params["mlp"]["fc1"], y)
        y = gelu(y)
        y = Linear(hidden, self.dim, param_dtype=self.param_dtype)(params["mlp"]["fc2"], y)
        return q + y


@dataclass(frozen=True)
class AttentivePooler(TokenResampler):
    """Learnable-query cross-attention pooling (JEPA attentive pooler,
    reference nn_utils.py:177-246)."""

    vision_dim: int
    llm_dim: int
    num_query_tokens: int
    num_heads: int = 8
    output_frames: int = 8
    mlp_type: str = "gelu-mlp"

    def __post_init__(self) -> None:
        assert self.vision_dim % self.num_heads == 0, "vision_dim must be divisible by num_heads"

    @property
    def block(self) -> CrossAttentionBlock:
        return CrossAttentionBlock(self.vision_dim, self.num_heads, qkv_bias=True)

    @property
    def projector(self) -> Module:
        return get_mlp_projector(self.vision_dim, self.llm_dim, self.mlp_type)

    def init(self, key: Array) -> PyTree:
        ks = jax.random.split(key, 3)
        return {
            "query_tokens": trunc_normal_init(0.02)(ks[0], (1, self.num_query_tokens, self.vision_dim), jnp.float32),
            "cross_attn": self.block.init(ks[1]),
            "projector": self.projector.init(ks[2]),
        }

    def __call__(self, params: PyTree, x: Array) -> Array:
        """x: [B, F, N, C] -> [B, F*num_query_tokens, llm_dim]."""
        B, F, N, C = x.shape
        assert F == self.output_frames, (F, self.output_frames)
        x = x.reshape(B * F, N, C)
        q = jnp.broadcast_to(params["query_tokens"].astype(x.dtype), (B * F, self.num_query_tokens, C))
        q = self.block(params["cross_attn"], q, x)
        q = self.projector(params["projector"], q)
        return q.reshape(B, F * self.num_query_tokens, -1)

    @property
    def output_token_length(self) -> int:
        return self.num_query_tokens

    @property
    def output_frame_length(self) -> int:
        return self.output_frames


# ---------------------------------------------------------------------------
# Convolutional projectors
# ---------------------------------------------------------------------------


def _conv2d(x: Array, kernel: Array, bias: Optional[Array], *, groups: int = 1, padding: int = 0) -> Array:
    """NCHW conv, torch weight layout [out, in/groups, kh, kw]."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(1, 1), padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias.astype(x.dtype)[None, :, None, None]
    return y


def _conv3d(x: Array, kernel: Array, bias: Optional[Array], *, padding: int = 0) -> Array:
    """NCDHW conv, torch weight layout [out, in, kt, kh, kw]."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(1, 1, 1), padding=[(padding, padding)] * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    if bias is not None:
        y = y + bias.astype(x.dtype)[None, :, None, None, None]
    return y


def _conv_init(key: Array, shape: Tuple[int, ...], dtype: Any) -> Array:
    """torch Conv default: kaiming_uniform(a=sqrt(5)) => U(±1/sqrt(fan_in))."""
    fan_in = int(np.prod(shape[1:]))
    return kaiming_uniform(key, shape, dtype, fan_in)


@dataclass(frozen=True)
class _LayerNorm2d(Module):
    """Channel LayerNorm over NCHW (timm LayerNorm2d)."""

    dim: int
    param_dtype: Any = jnp.float32

    def init(self, key: Array) -> PyTree:
        return LayerNorm(self.dim, param_dtype=self.param_dtype).init(key)

    def __call__(self, params: PyTree, x: Array) -> Array:
        # [B, C, H, W]: normalize over C
        y = x.transpose(0, 2, 3, 1)
        y = LayerNorm(self.dim, param_dtype=self.param_dtype)(params, y)
        return y.transpose(0, 3, 1, 2)


@dataclass(frozen=True)
class _RegBlock(Module):
    """timm RegNet ``Bottleneck`` (stride 1) exactly as the Honeybee
    C-Abstractor configures it (reference nn_utils.py:265:
    ``RegStage(..., act_layer=nn.SiLU, norm_layer=LayerNorm2d)`` with timm
    defaults ``bottle_ratio=1, group_size=1, se_ratio=0.25,
    downsample='conv1x1'``):

      conv1: 1x1 conv -> LayerNorm2d -> SiLU
      conv2: 3x3 conv, groups == channels (group_size=1) -> LayerNorm2d -> SiLU
      se:    squeeze-excite, rd_channels = round(in_chs * 0.25), SiLU gate act
      conv3: 1x1 conv -> LayerNorm2d (apply_act=False)
      downsample (in != out): 1x1 conv -> LayerNorm2d (no act)
      out = SiLU(conv_path + downsample(x))

    Param keys mirror the timm state-dict layout (``conv1.conv``/``conv1.bn``,
    ``se.fc1``/``se.fc2``, ``downsample.conv``/``downsample.bn``) so
    checkpoint import in ckpt_import.py is a direct key map.
    """

    in_dim: int
    out_dim: int
    param_dtype: Any = jnp.float32

    @property
    def rd_dim(self) -> int:
        # timm Bottleneck: se_channels = int(round(in_chs * se_ratio))
        return max(1, int(round(self.in_dim * 0.25)))

    def init(self, key: Array) -> PyTree:
        ks = jax.random.split(key, 6)
        d_in, d_out, rd = self.in_dim, self.out_dim, self.rd_dim
        ln = _LayerNorm2d(d_out, self.param_dtype)

        def bias(k, n, fan_in):
            return kaiming_uniform(k, (n,), self.param_dtype, fan_in)  # torch conv bias: U(±1/sqrt(fan_in))

        p = {
            "conv1": {"conv": {"kernel": _conv_init(ks[0], (d_out, d_in, 1, 1), self.param_dtype)}, "bn": ln.init(ks[0])},
            "conv2": {"conv": {"kernel": _conv_init(ks[1], (d_out, 1, 3, 3), self.param_dtype)}, "bn": ln.init(ks[1])},
            "se": {
                "fc1": {"kernel": _conv_init(ks[2], (rd, d_out, 1, 1), self.param_dtype), "bias": bias(ks[2], rd, d_out)},
                "fc2": {"kernel": _conv_init(ks[3], (d_out, rd, 1, 1), self.param_dtype), "bias": bias(ks[3], d_out, rd)},
            },
            "conv3": {"conv": {"kernel": _conv_init(ks[4], (d_out, d_out, 1, 1), self.param_dtype)}, "bn": ln.init(ks[4])},
        }
        if d_in != d_out:
            p["downsample"] = {
                "conv": {"kernel": _conv_init(ks[5], (d_out, d_in, 1, 1), self.param_dtype)},
                "bn": ln.init(ks[5]),
            }
        return p

    def __call__(self, params: PyTree, x: Array) -> Array:
        ln = _LayerNorm2d(self.out_dim, self.param_dtype)
        if "downsample" in params:
            short = ln(params["downsample"]["bn"], _conv2d(x, params["downsample"]["conv"]["kernel"], None))
        else:
            short = x
        y = jax.nn.silu(ln(params["conv1"]["bn"], _conv2d(x, params["conv1"]["conv"]["kernel"], None)))
        y = jax.nn.silu(
            ln(params["conv2"]["bn"], _conv2d(y, params["conv2"]["conv"]["kernel"], None, groups=self.out_dim, padding=1))
        )
        s = y.mean(axis=(2, 3), keepdims=True)  # SE squeeze over H, W
        s = jax.nn.silu(_conv2d(s, params["se"]["fc1"]["kernel"], params["se"]["fc1"]["bias"]))
        s = jax.nn.sigmoid(_conv2d(s, params["se"]["fc2"]["kernel"], params["se"]["fc2"]["bias"]))
        y = y * s
        y = ln(params["conv3"]["bn"], _conv2d(y, params["conv3"]["conv"]["kernel"], None))
        return jax.nn.silu(y + short)


@dataclass(frozen=True)
class ConvolutionalProjector(TokenResampler):
    """Honeybee C-Abstractor (reference nn_utils.py:249-303): RegStage ->
    adaptive avg-pool -> RegStage -> MLP."""

    vision_dim: int
    llm_dim: int
    output_size: int
    block_depth: int = 3
    output_frames: int = 8
    mlp_type: str = "gelu-mlp"

    def _blocks(self) -> Tuple[Tuple[str, _RegBlock], ...]:
        blocks = []
        for i in range(self.block_depth):
            blocks.append((f"stage1_{i}", _RegBlock(self.vision_dim if i == 0 else self.llm_dim, self.llm_dim)))
        for i in range(self.block_depth):
            blocks.append((f"stage2_{i}", _RegBlock(self.llm_dim, self.llm_dim)))
        return tuple(blocks)

    @property
    def projector(self) -> Module:
        return get_mlp_projector(self.llm_dim, self.llm_dim, self.mlp_type)

    def init(self, key: Array) -> PyTree:
        blocks = self._blocks()
        ks = jax.random.split(key, len(blocks) + 1)
        p = {name: blk.init(k) for (name, blk), k in zip(blocks, ks[:-1])}
        p["projector"] = self.projector.init(ks[-1])
        return p

    def __call__(self, params: PyTree, x: Array) -> Array:
        """x: [B, F, N, C] -> [B, F*S*S, llm_dim]."""
        B, F, N, C = x.shape
        assert F == self.output_frames, (F, self.output_frames)
        H = int(math.isqrt(N))
        y = x.reshape(B * F, H, H, C).transpose(0, 3, 1, 2)  # [BF, C, H, W]
        blocks = dict(self._blocks())
        for i in range(self.block_depth):
            y = blocks[f"stage1_{i}"](params[f"stage1_{i}"], y)
        y = y.transpose(0, 2, 3, 1)
        y = adaptive_avg_pool_2d(y, (self.output_size, self.output_size))
        y = y.transpose(0, 3, 1, 2)
        for i in range(self.block_depth):
            y = blocks[f"stage2_{i}"](params[f"stage2_{i}"], y)
        y = y.transpose(0, 2, 3, 1).reshape(B, F, self.output_size**2, self.llm_dim)
        y = self.projector(params["projector"], y)
        return y.reshape(B, F * self.output_size**2, -1)

    @property
    def output_token_length(self) -> int:
        return self.output_size**2

    @property
    def output_frame_length(self) -> int:
        return self.output_frames


@dataclass(frozen=True)
class AveragePooling3DProjector(TokenResampler):
    """Default merv projector: adaptive 3D avg-pool over (frames, H, W) + MLP
    (reference nn_utils.py:306-338)."""

    vision_dim: int
    llm_dim: int
    output_frames: int
    output_size: int
    mlp_type: str = "gelu-mlp"

    @property
    def projector(self) -> Module:
        return get_mlp_projector(self.vision_dim, self.llm_dim, self.mlp_type)

    def init(self, key: Array) -> PyTree:
        return {"projector": self.projector.init(key)}

    def __call__(self, params: PyTree, x: Array) -> Array:
        """x: [B, F, N, C] -> [B, output_frames*S*S, llm_dim]."""
        B, F, N, C = x.shape
        H = int(math.isqrt(N))
        x = x.reshape(B, F, H, H, C)
        x = adaptive_avg_pool_3d(x, (self.output_frames, self.output_size, self.output_size))
        x = x.reshape(B, self.output_frames * self.output_size**2, C)
        return self.projector(params["projector"], x)

    @property
    def output_token_length(self) -> int:
        return self.output_size**2

    @property
    def output_frame_length(self) -> int:
        return self.output_frames


@dataclass(frozen=True)
class Convolutional3DProjector(TokenResampler):
    """Conv3d (k3 s1 p1) + adaptive 3D avg-pool + MLP (reference nn_utils.py:341-377)."""

    vision_dim: int
    llm_dim: int
    output_frames: int
    output_size: int
    mlp_type: str = "gelu-mlp"

    @property
    def projector(self) -> Module:
        return get_mlp_projector(self.llm_dim, self.llm_dim, self.mlp_type)

    def init(self, key: Array) -> PyTree:
        ks = jax.random.split(key, 3)
        shape = (self.llm_dim, self.vision_dim, 3, 3, 3)
        fan_in = self.vision_dim * 27
        return {
            "conv": {
                "kernel": _conv_init(ks[0], shape, jnp.float32),
                "bias": kaiming_uniform(ks[1], (self.llm_dim,), jnp.float32, fan_in),
            },
            "projector": self.projector.init(ks[2]),
        }

    def __call__(self, params: PyTree, x: Array) -> Array:
        """x: [B, F, N, C] -> [B, output_frames*S*S, llm_dim]."""
        B, F, N, C = x.shape
        H = int(math.isqrt(N))
        y = x.reshape(B, F, H, H, C).transpose(0, 4, 1, 2, 3)  # [B, C, F, H, W]
        y = _conv3d(y, params["conv"]["kernel"], params["conv"]["bias"], padding=1)
        y = y.transpose(0, 2, 3, 4, 1)  # [B, F, H, W, C']
        y = adaptive_avg_pool_3d(y, (self.output_frames, self.output_size, self.output_size))
        y = y.reshape(B, self.output_frames * self.output_size**2, self.llm_dim)
        return self.projector(params["projector"], y)

    @property
    def output_token_length(self) -> int:
        return self.output_size**2

    @property
    def output_frame_length(self) -> int:
        return self.output_frames
