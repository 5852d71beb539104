"""Whole-layer fused ViT attention block: one Pallas kernel spanning
LN1 -> q/k/v GEMMs -> per-head attention -> o-proj -> LayerScale -> residual.

This is the round-4 BASELINE.md experiment ("closing the pinned ~12 ms/tower
above the GEMM floor needs whole-layer fusion — one kernel spanning LN + qkv
GEMMs + attention + o-proj"), built and measured once so the lever is either
banked or retired with a number. The hypothesis: the XLA path streams the
[B, S, D] activation through HBM at every op boundary (LN out, 3 projection
outs, attention out, o-proj in ~= 6 round trips x ~17 MB at DINOv2-L bench
shapes); keeping the whole residual branch in VMEM removes them.

Kernel layout (grid over images, one [S, D] row set per step):
- weights (Wq/Wk/Wv/Wo + biases + LN affine + LayerScale gamma) use constant
  index maps — fetched into VMEM once, resident across the grid;
- LN statistics in f32 (exactly :class:`merv_tpu.nn.core.LayerNorm`);
- per-head: q_h = xn @ Wq[:, h] etc. (slicing the WEIGHT column block, so the
  full [S, 3D] qkv tensor never materializes), scores f32 with a key-side
  pad mask, softmax, o-proj accumulated as sum_h (out_h @ Wo[h rows]) — the
  concat-free decomposition of the output projection;
- out = x + gamma * (attn out + o bias), residual add in f32.

Numerics: matches the XLA path to bf16 rounding (same f32 LN, same f32
softmax, same contraction dtypes); NOT bit-identical (different GEMM tiling).
Backward recomputes via the XLA reference (towers are frozen in every
reference training stage, reference ``merv/models/vidlms/merv.py:154-163``).

Opt-in via ``MERV_TPU_FUSED_VIT_BLOCK=1`` (``vit.py::_layer``); measured by
``scripts/bench_tower_attn.py --impl fused_block``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend (absent on some CPU-only builds)
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_TPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _PALLAS_TPU = False

Array = jax.Array

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)

# test hook: interpreter mode (validates kernel logic on CPU)
_INTERPRET = False


def _fused_block_kernel(
    x_ref, ns_ref, nb_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wo_ref, bo_ref, g_ref, o_ref, *, heads: int, seq: int, eps: float,
):
    x = x_ref[0]  # [Sp, D] compute dtype
    Sp, D = x.shape
    dh = D // heads
    scale = dh ** -0.5

    # LayerNorm in f32 (mirrors nn.core.LayerNorm bit-for-bit); affine params
    # stay [1, D] (Mosaic-friendly 2D broadcasts)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * ns_ref[...].astype(jnp.float32) + nb_ref[...].astype(jnp.float32)).astype(x.dtype)

    # key-side pad mask: rows past the true sequence end are zero-padding and
    # must not receive softmax mass
    col = jax.lax.broadcasted_iota(jnp.int32, (Sp, Sp), 1)
    pad_mask = col < seq

    y = jnp.zeros((Sp, D), jnp.float32)  # o-proj accumulator (f32)
    for h in range(heads):  # static unroll: one resident-weight GEMM chain per head
        lo = h * dh
        wq_h = jax.lax.slice_in_dim(wq_ref[0], lo, lo + dh, axis=1)
        wk_h = jax.lax.slice_in_dim(wk_ref[0], lo, lo + dh, axis=1)
        wv_h = jax.lax.slice_in_dim(wv_ref[0], lo, lo + dh, axis=1)
        bq_h = jax.lax.slice_in_dim(bq_ref[...], lo, lo + dh, axis=1)  # [1, dh]
        bk_h = jax.lax.slice_in_dim(bk_ref[...], lo, lo + dh, axis=1)
        bv_h = jax.lax.slice_in_dim(bv_ref[...], lo, lo + dh, axis=1)
        q_h = jax.lax.dot_general(
            xn, wq_h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + bq_h.astype(jnp.float32)
        k_h = jax.lax.dot_general(
            xn, wk_h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + bk_h.astype(jnp.float32)
        v_h = jax.lax.dot_general(
            xn, wv_h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + bv_h.astype(jnp.float32)
        # scores: contract the head dim of q against the head dim of k —
        # [Sp, Sp] f32, no transpose materialized
        s = jax.lax.dot_general(
            q_h.astype(x.dtype), k_h.astype(x.dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(pad_mask, s, DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o_h = jax.lax.dot_general(
            (p / l).astype(x.dtype), v_h.astype(x.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [Sp, dh]
        wo_h = jax.lax.slice_in_dim(wo_ref[0], lo, lo + dh, axis=0)  # [dh, D]
        y = y + jax.lax.dot_general(
            o_h.astype(x.dtype), wo_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y = y + bo_ref[...].astype(jnp.float32)
    o_ref[0] = (xf + g_ref[...].astype(jnp.float32) * y).astype(o_ref.dtype)


def _fused_block_fwd_impl(
    x: Array, norm_scale: Array, norm_bias: Array,
    wq: Array, bq: Array, wk: Array, bk: Array, wv: Array, bv: Array,
    wo: Array, bo: Array, gamma: Array, heads: int, eps: float,
) -> Array:
    B, S, D = x.shape
    Sp = -(-S // 16) * 16
    if Sp != S:
        x = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))

    def row(a):  # [D]/[D,D] params enter as 1-leading-dim blocks
        return a.reshape(1, *a.shape)

    const = lambda *_: (0,) * 2  # noqa: E731
    const3 = lambda *_: (0,) * 3  # noqa: E731
    kernel = functools.partial(_fused_block_kernel, heads=heads, seq=S, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Sp, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, D), const), pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D, D), const3), pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D, D), const3), pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D, D), const3), pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D, D), const3), pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
        ],
        out_specs=pl.BlockSpec((1, Sp, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Sp, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ) if _PALLAS_TPU else None,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Sp * D * (4 * D) + 4 * B * Sp * Sp * D,
            bytes_accessed=2 * B * Sp * D * x.dtype.itemsize + 4 * D * D * 2,
            transcendentals=B * Sp * Sp,
        ),
        interpret=_INTERPRET,
    )(
        x, row(norm_scale), row(norm_bias),
        row(wq), row(bq), row(wk), row(bk), row(wv), row(bv),
        row(wo), row(bo), row(gamma),
    )
    return out[:, :S, :] if Sp != S else out


def _fused_block_reference(
    x, norm_scale, norm_bias, wq, bq, wk, bk, wv, bv, wo, bo, gamma, heads, eps
):
    """XLA mirror of the kernel (backward recompute + CPU tests)."""
    B, S, D = x.shape
    dh = D // heads
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * norm_scale.astype(jnp.float32) + norm_bias.astype(jnp.float32)).astype(x.dtype)
    def proj(w, b):
        return (jnp.einsum("bsd,dhk->bhsk", xn, w.astype(x.dtype).reshape(D, heads, dh))
                + b.astype(x.dtype).reshape(heads, 1, dh))
    q, k, v = proj(wq, bq), proj(wk, bk), proj(wv, bv)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * dh ** -0.5
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(x.dtype), v)
    y = jnp.einsum("bhsk,hkd->bsd", o, wo.astype(x.dtype).reshape(heads, dh, D),
                   preferred_element_type=jnp.float32)
    y = y + bo.astype(jnp.float32)
    return (xf + gamma.astype(jnp.float32) * y).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13))
def fused_vit_attn_block(
    x: Array, norm_scale: Array, norm_bias: Array,
    wq: Array, bq: Array, wk: Array, bk: Array, wv: Array, bv: Array,
    wo: Array, bo: Array, gamma: Array, heads: int, eps: float,
) -> Array:
    """``x + gamma * o_proj(attn(qkv(LN(x))))`` as ONE Pallas program.

    x [B, S, D]; weights stored (in, out) like :class:`nn.core.Linear`;
    ``gamma`` is the DINOv2 LayerScale vector (pass ones for towers without
    LayerScale). Requires D % heads == 0; S is padded to the sublane tile
    internally with a key-side mask.
    """
    return _fused_block_fwd_impl(
        x, norm_scale, norm_bias, wq, bq, wk, bk, wv, bv, wo, bo, gamma, heads, eps
    )


def _fused_block_fwd_rule(x, ns, nb, wq, bq, wk, bk, wv, bv, wo, bo, g, heads, eps):
    out = _fused_block_fwd_impl(x, ns, nb, wq, bq, wk, bk, wv, bv, wo, bo, g, heads, eps)
    return out, (x, ns, nb, wq, bq, wk, bk, wv, bv, wo, bo, g)


def _fused_block_bwd_rule(heads, eps, res, gout):
    x, ns, nb, wq, bq, wk, bk, wv, bv, wo, bo, g = res
    _, vjp = jax.vjp(
        lambda *a: _fused_block_reference(*a, heads, eps),
        x, ns, nb, wq, bq, wk, bk, wv, bv, wo, bo, g,
    )
    return vjp(gout)


fused_vit_attn_block.defvjp(_fused_block_fwd_rule, _fused_block_bwd_rule)
