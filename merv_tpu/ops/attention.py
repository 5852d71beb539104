"""Attention ops: Pallas TPU flash attention + XLA reference.

TPU-native replacement for the reference's CUDA attention kernels:
- flash-attn 2 in the LLM (`merv/models/backbones/llm/base_llm.py:121`)
- F.scaled_dot_product_attention in the AttentivePooler (`merv/util/nn_utils.py:401-403`)
- HF eager/SDPA attention inside the vision towers.

One entry point, :func:`attention`, dispatches:
- **Pallas flash kernel** (block-wise online softmax, MXU-tiled, O(T) memory)
  for long-sequence forward passes on TPU;
- **XLA reference** (materialized scores) for CPU tests, short sequences, and
  the backward pass (round-1; a Pallas backward kernel is the perf-pass item).

Shapes follow the JAX convention ``[batch, heads, seq, head_dim]``; grouped
query attention (Qwen-2.5 / Llama-3) is supported via ``num_kv_heads < num_heads``
handled in the BlockSpec index map (no KV head replication in HBM).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

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

# test hook: run the Pallas kernel in interpreter mode (validates kernel logic on CPU)
_INTERPRET = False


def _pick_block(seq: int, target: int) -> int:
    """Largest multiple-of-128 block <= target that tiles seq (seq pre-padded)."""
    b = min(target, seq)
    return max(128, (b // 128) * 128) if seq >= 128 else seq


def _pick_block_b(batch: int, seq: int, head_dim: int) -> int:
    """Library-flash batch block: largest divisor of ``batch`` <= 8 — fewer
    grid cells, measured ~7% faster than block_b=1 at both [2,...] and
    [8,...] LLM prefill shapes — capped so ``block_b * seq * head_dim``
    stays inside the kernel's 16 MiB scoped-VMEM envelope. Measured v5e
    envelope points: [8, 12, 3584, 64] (ViViT tower, bsz 8) = 1.84M
    elements allocated 18.25M scoped VMEM and FAILED to compile; the
    largest measured-GOOD config is LLM prefill [8, 32, 1216, 128] = 1.245M
    elements (compiles, carries the block_b win), which sets the budget.
    bsz 4 at the ViViT shape (0.92M) also compiles."""
    budget = 8 * 1216 * 128  # elements: largest measured-good block_b*seq*head_dim
    cap = max(1, budget // max(seq * head_dim, 1))
    return next(d for d in range(min(batch, 8, cap), 0, -1) if batch % d == 0)


def _tight_blocks(seq: int, align: int, max_block: int) -> Tuple[int, int]:
    """(block, n_blocks) minimizing padded length ``n * block`` with
    ``block % align == 0`` and ``block <= max_block``.

    Unlike fixed-512 blocks (which pad 261 -> 512, 2x wasted compute on the
    short vision-tower sequences), this searches all block counts and keeps
    padding to the alignment floor: 261 -> 272 (q, align 16) / 384 (kv, align
    128). Ties prefer fewer, larger blocks (less loop overhead).
    """
    candidates = []
    for n in range(1, -(-seq // align) + 1):
        per_block = -(-seq // n)
        b = -(-per_block // align) * align
        if b > max_block:
            continue
        candidates.append((n * b, n, b))
    if not candidates:  # seq too long for one aligned block: classic tiling
        b = max_block
        return b, -(-seq // b)
    min_padded = min(c[0] for c in candidates)
    # among near-minimal paddings (<=10% over), take the largest block:
    # fewer kv-loop iterations / grid cells at negligible extra compute
    _, n, b = max(
        (c for c in candidates if c[0] <= min_padded * 1.1 + align),
        key=lambda c: c[2],
    )
    return b, n


# ---------------------------------------------------------------------------
# XLA reference implementation (also the backward path in round 1)
# ---------------------------------------------------------------------------


def attention_reference(
    q: Array,
    k: Array,
    v: Array,
    *,
    causal: bool = False,
    kv_mask: Optional[Array] = None,
    bias: Optional[Array] = None,
    scale: Optional[float] = None,
    q_offset: Optional[Array] = None,
) -> Array:
    """Materialized-scores attention. q:[B,H,Tq,D] k,v:[B,Hk,Tk,D] kv_mask:[B,Tk] bool."""
    B, H, Tq, D = q.shape
    Hk = k.shape[1]
    if Hk != H:
        assert H % Hk == 0
        rep = H // Hk
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    scale = (D ** -0.5) if scale is None else scale
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, DEFAULT_MASK_VALUE)
    if causal:
        Tk = k.shape[2]
        offset = (Tk - Tq) if q_offset is None else q_offset
        qi = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 1)
        if getattr(offset, "ndim", 0) == 1:
            # per-row offsets (continuous-batching verify: each slot's queries
            # start at its own cache length) -> [B, Tq, Tk] causal mask
            cm = ki[None] <= (qi[None] + offset[:, None, None])
            logits = jnp.where(cm[:, None], logits, DEFAULT_MASK_VALUE)
        else:
            logits = jnp.where((ki <= (qi + offset))[None, None], logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def attention_chunked(
    q: Array,
    k: Array,
    v: Array,
    *,
    causal: bool = False,
    kv_mask: Optional[Array] = None,
    scale: Optional[float] = None,
    q_offset: Optional[Array] = None,
    block_q: int = 256,
) -> Array:
    """Memory-bounded attention for platforms without the Pallas kernels.

    ``lax.scan`` over query blocks with a remat'd body: live scores are
    ``[B, H, block_q, Tk]`` instead of ``[B, H, Tq, Tk]``, and the backward
    pass recomputes each block's scores (flash-style) rather than saving
    them. This is what the CPU-mesh tests and the AOT memory proof
    (``scripts/memory_proof.py``) run at exactly the shapes the TPU would
    dispatch to a flash kernel, so their compiled memory profile models the
    real program instead of the O(Tq·Tk) materialized fallback. Numerics
    match :func:`attention_reference` (fp32 scores, same mask value).
    """
    B, H, Tq, D = q.shape
    Hk, Tk = k.shape[1], k.shape[2]
    assert H % Hk == 0
    G = H // Hk
    scale = (D ** -0.5) if scale is None else scale
    offset = (Tk - Tq) if q_offset is None else q_offset

    pad = (-Tq) % block_q
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else q
    nb = (Tq + pad) // block_q
    # [nb, B, Hk, G, block_q, D] scan xs
    qs = qp.reshape(B, Hk, G, nb, block_q, D).transpose(3, 0, 1, 2, 4, 5)
    starts = jnp.arange(nb, dtype=jnp.int32) * block_q
    ki = jnp.arange(Tk, dtype=jnp.int32)

    def body(start: Array, qblk: Array) -> Array:
        s = jnp.einsum("bhgqd,bhkd->bhgqk", qblk, k, preferred_element_type=jnp.float32) * scale
        if kv_mask is not None:
            s = jnp.where(kv_mask[:, None, None, None, :], s, DEFAULT_MASK_VALUE)
        if causal:
            qi = start + jnp.arange(block_q, dtype=jnp.int32)
            if getattr(offset, "ndim", 0) == 1:  # per-row offsets ([B])
                cm = ki[None, None, :] <= (qi[None, :, None] + offset[:, None, None])
                s = jnp.where(cm[:, None, None], s, DEFAULT_MASK_VALUE)
            else:
                s = jnp.where((ki[None, :] <= (qi + offset)[:, None])[None, None, None],
                              s, DEFAULT_MASK_VALUE)
        probs = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhgqk,bhkd->bhgqd", probs, v)

    def scan_body(carry, x):
        start, qblk = x
        return carry, jax.checkpoint(body)(start, qblk)

    _, outs = jax.lax.scan(scan_body, jnp.zeros((), jnp.int32), (starts, qs))
    # [nb, B, Hk, G, block_q, D] -> [B, H, Tq, D]
    out = outs.transpose(1, 2, 3, 0, 4, 5).reshape(B, H, nb * block_q, D)
    return out[:, :, :Tq]


# ---------------------------------------------------------------------------
# Pallas flash forward
# ---------------------------------------------------------------------------


def _flash_fwd_kernel(
    qoff_ref,  # [1] int32 in SMEM: absolute kv position of query row 0
    mask_ref,  # [B, n_kv_blocks, block_k] int32 in VMEM. The block axis is a
    #            MAJOR axis on purpose: Mosaic crashes on dynamic slices along
    #            the minor (lane) axis, so the kv-loop index selects a whole
    #            [block_k] row instead of pl.ds-ing into a [Tk] vector.
    q_ref,  # [1, 1, Bq, D]
    k_ref,  # [1, 1, Tk, D]
    v_ref,  # [1, 1, Tk, D]
    o_ref,  # [1, 1, Bq, D]
    *,
    causal: bool,
    scale: float,
    block_k: int,
    kv_len: int,
    use_mask: bool,
):
    q_block_idx = pl.program_id(2)
    bq = q_ref.shape[2]
    d = q_ref.shape[3]
    q_offset = qoff_ref[0]
    batch_idx = pl.program_id(0)

    # Keep q/k/v in their input dtype (bf16): the MXU runs bf16 x bf16 with
    # fp32 accumulation natively via preferred_element_type — upcasting the
    # inputs to fp32 before the dot (as this kernel originally did) forces
    # fp32 MXU passes at a fraction of the bf16 rate and was the single
    # biggest cost in the kernel. The scale is applied to the fp32 scores.
    q = q_ref[0, 0, :, :]

    m_init = jnp.full((bq, 1), DEFAULT_MASK_VALUE, jnp.float32)
    l_init = jnp.zeros((bq, 1), jnp.float32)
    acc_init = jnp.zeros((bq, d), jnp.float32)

    num_kv_blocks = pl.cdiv(kv_len, block_k)
    n_full = jnp.int32(0)
    if causal:
        # highest absolute q position in this block, relative to kv timeline
        q_end = (q_block_idx + 1) * bq + q_offset
        num_kv_blocks = jnp.minimum(num_kv_blocks, pl.cdiv(q_end, block_k))
        if not use_mask:
            # kv blocks whose every key precedes this q block's FIRST row are
            # entirely below the causal diagonal: no iotas, no where, no
            # valid-multiply needed. Only boundary blocks pay the mask work.
            n_full = jnp.maximum((q_block_idx * bq + q_offset + 1) // block_k, 0)
            n_full = jnp.minimum(n_full, num_kv_blocks)
    elif not use_mask:
        n_full = num_kv_blocks  # nothing to mask anywhere

    def make_body(masked: bool):
        def body(kv_i, carry):
            m_prev, l_prev, acc_prev = carry
            k_blk = k_ref[0, 0, pl.ds(kv_i * block_k, block_k), :]
            v_blk = v_ref[0, 0, pl.ds(kv_i * block_k, block_k), :]

            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [bq, block_k] fp32

            if masked:
                valid = jnp.ones((bq, block_k), jnp.bool_)
                if use_mask:
                    kvm = mask_ref[batch_idx, kv_i, :]
                    valid = valid & (kvm > 0)[None, :]
                if causal:
                    q_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0) + q_block_idx * bq + q_offset
                    k_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + kv_i * block_k
                    valid = valid & (k_pos <= q_pos)
                s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            if masked:
                # exact zero at masked positions: exp(MASK - m) == 1 when a
                # row is fully masked (m == MASK), which would corrupt l; the
                # multiply keeps l == 0 there so the safe_l guard returns 0
                p = p * valid.astype(jnp.float32)
            l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            # p cast to the kv dtype (bf16) so the PV product also runs bf16
            # MXU passes; accumulation stays fp32 (standard flash precision).
            acc_new = acc_prev * alpha + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            return m_new, l_new, acc_new

        return body

    carry = (m_init, l_init, acc_init)
    carry = jax.lax.fori_loop(0, n_full, make_body(masked=False), carry)
    m, l, acc = jax.lax.fori_loop(n_full, num_kv_blocks, make_body(masked=True), carry)
    # rows with no valid keys (fully masked) produce l=0 -> output 0
    safe_l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0, :, :] = (acc / safe_l).astype(o_ref.dtype)


def _flash_forward(
    q: Array,
    k: Array,
    v: Array,
    kv_mask: Optional[Array],
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    q_offset: Optional[Array] = None,
) -> Array:
    B, H, Tq, D = q.shape
    _, Hk, Tk, _ = k.shape
    assert H % Hk == 0, (H, Hk)
    q_per_kv = H // Hk

    # Pad head_dim to a 128-lane multiple (MXU tile width). Zero-padding is
    # exact: q.k logits are unchanged (extra dims contribute 0) and the padded
    # v columns produce output columns that are sliced off below. This is what
    # lets every vision tower (head_dim 64: SigLIP/DINOv2/ViViT/LanguageBind)
    # run the flash kernel instead of materializing [T, T] scores — the caller
    # computes `scale` from the ORIGINAL D before padding.
    Dp = max(128, -(-D // 128) * 128)
    if Dp != D:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))

    # Tight block selection (see _tight_blocks): q blocks align to the bf16
    # sublane tile (16), kv blocks to the lane tile (128). On the short
    # vision-tower sequences this is the difference between padding 261 -> 512
    # (2x wasted MXU work with fixed 512 blocks) and 261 -> 272/384.
    bq, nq = _tight_blocks(Tq, 16, block_q)
    bk, nk = _tight_blocks(Tk, 128, block_k)

    # pad sequences to block multiples; padded keys masked via kv_mask —
    # EXCEPT under self-causal alignment (Tq == Tk, offset 0), where every
    # padded key sits after every valid query: causality already excludes the
    # padding, so the mask machinery can be skipped entirely (padded q rows
    # compute garbage that is sliced off below).
    Tq_p = nq * bq
    Tk_p = nk * bk
    self_causal = causal and q_offset is None and Tq == Tk
    use_mask = kv_mask is not None or (Tk_p != Tk and not self_causal)
    if kv_mask is None:
        kv_mask_i = jnp.ones((B, Tk), jnp.int32)
    else:
        kv_mask_i = kv_mask.astype(jnp.int32)
    if Tk_p != Tk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Tk_p - Tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Tk_p - Tk), (0, 0)))
        kv_mask_i = jnp.pad(kv_mask_i, ((0, 0), (0, Tk_p - Tk)))
    if Tq_p != Tq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Tq_p - Tq), (0, 0)))
    # block axis major (see kernel docstring): [B, n_kv_blocks, block_k]
    kv_mask_i = kv_mask_i.reshape(B, Tk_p // bk, bk)

    grid = (B, H, Tq_p // bq)

    # default causal alignment: end of q timeline against end of (unpadded) kv timeline
    qoff = jnp.asarray([Tk - Tq if q_offset is None else q_offset], jnp.int32).reshape(1)

    kernel = functools.partial(
        _flash_fwd_kernel,
        causal=causal,
        scale=scale,
        block_k=bk,
        kv_len=Tk_p,
        use_mask=use_mask,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM if _PALLAS_TPU else pl.ANY),
            pl.BlockSpec((1, 1, bq, Dp), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Tk_p, Dp), lambda b, h, i: (b, h // q_per_kv, 0, 0)),
            pl.BlockSpec((1, 1, Tk_p, Dp), lambda b, h, i: (b, h // q_per_kv, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, Dp), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Tq_p, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tq_p * Tk_p * D,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Tq_p * Tk_p,
        ),
        interpret=_INTERPRET,
    )(qoff, kv_mask_i, q, k, v)
    if Tq_p != Tq:
        out = out[:, :, :Tq, :]
    if Dp != D:
        out = out[:, :, :, :D]
    return out


# ---------------------------------------------------------------------------
# Small-sequence kernel (vision-tower shapes)
# ---------------------------------------------------------------------------


def _small_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq: int, heads: int):
    """Whole-sequence attention for short T: one grid cell per batch item,
    heads unrolled inside the cell.

    The blocked flash kernel spends ~5us of fixed overhead per grid cell; at
    [32, 16, 261, 64] that is 512 cells of trivial work — overhead-dominated.
    Here the grid is (B,), K/V/Q for all heads sit in VMEM (~2.5 MB at tower
    shapes), and the 16 per-head dots amortize one cell's overhead. head_dim
    stays UNPADDED (the MXU tolerates K=64 contractions; padding to 128 in
    HBM costs two extra full passes over q/k/v).
    """
    Tp = q_ref.shape[2]
    for h in range(heads):  # static unroll
        q = q_ref[0, h]  # [Tp, D]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [Tp, Tp] fp32
        if Tp != seq:
            col = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
            s = jnp.where(col < seq, s, DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _small_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Non-causal, unmasked attention for Tq == Tk <= 512 (tower frames).

    Differentiable via XLA-recompute backward (towers are frozen in every
    reference training stage, so the backward is a correctness safety net,
    not a hot path)."""
    return _small_attention_fwd_impl(q, k, v, scale)


def _small_attention_fwd_impl(q: Array, k: Array, v: Array, scale: float) -> Array:
    B, H, T, D = q.shape
    if k.shape != q.shape or v.shape != q.shape:
        # GQA shapes broadcast kv heads (same numerics as attention_reference,
        # whose recompute the backward rule already uses); anything else is a
        # caller error — the dispatcher (`attention()`) never routes such
        # shapes here, this guards direct private callers
        Hk = k.shape[1]
        if not (k.shape == v.shape == (B, Hk, T, D) and Hk > 0 and H % Hk == 0):
            raise ValueError(
                f"small kernel: q {q.shape} with k {k.shape} / v {v.shape} is neither "
                f"self-shaped nor a GQA head grouping; use merv_tpu.ops.attention()"
            )
        rep = H // Hk
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    Tp = -(-T // 16) * 16  # bf16 sublane tile
    if Tp != T:
        pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    kernel = functools.partial(_small_attn_kernel, scale=scale, seq=T, heads=H)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, Tp, D), lambda b: (b, 0, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, H, Tp, D), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)) if _PALLAS_TPU else None,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tp * Tp * D,
            bytes_accessed=(q.size * 4) * q.dtype.itemsize,
            transcendentals=B * H * Tp * Tp,
        ),
        interpret=_INTERPRET,
    )(q, k, v)
    return out[:, :, :T, :] if Tp != T else out


def _small_attn_kernel_kt(q_ref, kt_ref, v_ref, o_ref, *, scale: float, seq: int, heads: int):
    """Variant of _small_attn_kernel taking K PRE-TRANSPOSED ([1, H, D, Tp]).

    The plain kernel's ``dot_general`` contracts k's trailing dim, which makes
    Mosaic materialize a per-head lane<->sublane transpose of k inside every
    grid cell; feeding kt directly keeps both dots in the MXU's natural
    A[M,K] @ B[K,N] form. The caller produces kt straight out of the k-proj
    GEMM (einsum output layout), so no transpose exists anywhere.
    """
    Tp = q_ref.shape[2]
    for h in range(heads):
        qh = q_ref[0, h]  # [Tp, D]
        kt = kt_ref[0, h]  # [D, Tp]
        vh = v_ref[0, h]  # [Tp, D]
        s = jax.lax.dot_general(
            qh, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if Tp != seq:
            col = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
            s = jnp.where(col < seq, s, DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def small_attention_kt(q: Array, kt: Array, v: Array, scale: float) -> Array:
    """Tower-frame attention with k pre-transposed: q/v [B,H,T,D], kt [B,H,D,T].

    Same numerics as :func:`_small_attention` (bit-identical measured);
    backward recomputes via the XLA reference (towers are frozen in every
    reference training stage).
    """
    return _small_attention_kt_fwd_impl(q, kt, v, scale)


def _small_attention_kt_fwd_impl(q: Array, kt: Array, v: Array, scale: float) -> Array:
    B, H, T, D = q.shape
    assert kt.shape == (B, H, D, T) and v.shape == q.shape
    Tp = -(-T // 16) * 16
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, 0), (0, Tp - T)))

    kernel = functools.partial(_small_attn_kernel_kt, scale=scale, seq=T, heads=H)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Tp, D), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, D, Tp), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Tp, D), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, Tp, D), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)) if _PALLAS_TPU else None,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tp * Tp * D,
            bytes_accessed=(q.size * 4) * q.dtype.itemsize,
            transcendentals=B * H * Tp * Tp,
        ),
        interpret=_INTERPRET,
    )(q, kt, v)
    return out[:, :, :T, :] if Tp != T else out


def _small_attention_kt_fwd_rule(q, kt, v, scale):
    return _small_attention_kt_fwd_impl(q, kt, v, scale), (q, kt, v)


def _small_attention_kt_bwd_rule(scale, res, g):
    q, kt, v = res
    k = kt.swapaxes(2, 3)
    _, vjp = jax.vjp(lambda q, k, v: attention_reference(q, k, v, scale=scale), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk.swapaxes(2, 3), dv


small_attention_kt.defvjp(_small_attention_kt_fwd_rule, _small_attention_kt_bwd_rule)


# ---------------------------------------------------------------------------
# Packed temporal attention (LanguageBind per-layer frame attention)
# ---------------------------------------------------------------------------


def _packed_temporal_kernel(q_ref, kt_ref, v_ref, o_ref, *, scale: float, heads: int):
    """One packed window: rows are (frame, head) pairs (row r's head is
    ``r % heads``); a query row attends exactly its own head's frame rows.
    Scores + interleaved-head mask + softmax + PV all stay in VMEM — the XLA
    bias path this replaces materialized a [Bn, R, R] f32 score tensor
    (~135 MB/layer at LanguageBind scale) through HBM twice per layer."""
    q = q_ref[0]  # [R, D]
    kt = kt_ref[0]  # [D, R]
    v = v_ref[0]  # [R, D]
    R = q.shape[0]
    s = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    row_h = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (R, R), 0), heads)
    col_h = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (R, R), 1), heads)
    s = jnp.where(row_h == col_h, s, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def packed_temporal_attention(q: Array, kt: Array, v: Array, scale: float, heads: int) -> Array:
    """Fused head-interleaved packed attention: q/v [Bn, R, D], kt [Bn, D, R],
    R = frames*heads rows ordered (frame, head). Row r attends rows r' with
    ``r % heads == r' % heads`` — the LanguageBind temporal-attention packing
    (``vit.py::_mha_time_packed``), mask computed IN-KERNEL instead of as a
    [R, R] f32 bias tensor the XLA path streamed through HBM.
    Backward recomputes via the XLA reference (LanguageBind towers are frozen
    in every reference training stage)."""
    return _packed_temporal_fwd_impl(q, kt, v, scale, heads)


def _packed_temporal_fwd_impl(q: Array, kt: Array, v: Array, scale: float, heads: int) -> Array:
    Bn, R, D = q.shape
    assert kt.shape == (Bn, D, R) and v.shape == q.shape, (q.shape, kt.shape, v.shape)
    kernel = functools.partial(_packed_temporal_kernel, scale=scale, heads=heads)
    return pl.pallas_call(
        kernel,
        grid=(Bn,),
        in_specs=[
            pl.BlockSpec((1, R, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, D, R), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, R, D), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bn, R, D), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)) if _PALLAS_TPU else None,
        cost_estimate=pl.CostEstimate(
            flops=4 * Bn * R * R * D,
            bytes_accessed=(q.size * 4) * q.dtype.itemsize,
            transcendentals=Bn * R * R,
        ),
        interpret=_INTERPRET,
    )(q, kt, v)


def _packed_temporal_reference(q: Array, kt: Array, v: Array, scale: float, heads: int) -> Array:
    R = q.shape[1]
    s = jnp.einsum("brd,bdc->brc", q, kt, preferred_element_type=jnp.float32) * scale
    idx = jnp.arange(R, dtype=jnp.int32)
    mask = (idx[:, None] % heads) == (idx[None, :] % heads)
    s = jnp.where(mask[None], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("brc,bcd->brd", p.astype(v.dtype), v).astype(q.dtype)


def _packed_temporal_fwd_rule(q, kt, v, scale, heads):
    return _packed_temporal_fwd_impl(q, kt, v, scale, heads), (q, kt, v)


def _packed_temporal_bwd_rule(scale, heads, res, g):
    q, kt, v = res
    _, vjp = jax.vjp(lambda q, kt, v: _packed_temporal_reference(q, kt, v, scale, heads), q, kt, v)
    return vjp(g)


packed_temporal_attention.defvjp(_packed_temporal_fwd_rule, _packed_temporal_bwd_rule)


def _small_attention_fwd_rule(q, k, v, scale):
    return _small_attention_fwd_impl(q, k, v, scale), (q, k, v)


def _small_attention_bwd_rule(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: attention_reference(q, k, v, scale=scale), q, k, v)
    return vjp(g)


_small_attention.defvjp(_small_attention_fwd_rule, _small_attention_bwd_rule)


# ---------------------------------------------------------------------------
# Public API with custom VJP (backward via XLA recompute for now)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_attention(q, k, v, causal, scale, block_q, block_k, has_mask, kv_mask=None):
    return _flash_forward(q, k, v, kv_mask if has_mask else None, causal, scale, block_q, block_k)


def _flash_fwd_rule(q, k, v, causal, scale, block_q, block_k, has_mask, kv_mask=None):
    out = _flash_forward(q, k, v, kv_mask if has_mask else None, causal, scale, block_q, block_k)
    return out, (q, k, v, kv_mask)


def _library_flash_call(q, k, v, causal, scale, qseg, kvseg):
    """Shared core over JAX's shipped Pallas TPU flash attention: GQA
    head-repeat, 512-block BlockSizes, segment-id plumbing. Both wrappers
    (exact-shape and padded) go through here so block-size tuning or a GQA
    fix cannot silently diverge between the forward and backward paths."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    H = q.shape[1]
    Hk = k.shape[1]
    if Hk != H:
        k = jnp.repeat(k, H // Hk, axis=1)
        v = jnp.repeat(v, H // Hk, axis=1)
    seg = None if kvseg is None else SegmentIds(q=qseg, kv=kvseg)
    bq = _pick_block(q.shape[2], 512)
    bk = _pick_block(k.shape[2], 512)
    bb = _pick_block_b(q.shape[0], max(q.shape[2], k.shape[2]), q.shape[3])
    sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=bb,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    return flash_attention(q, k, v, causal=causal, sm_scale=scale, segment_ids=seg, block_sizes=sizes)


def _library_flash(q, k, v, causal, scale, kv_mask):
    """Library flash at already-block-divisible shapes (the backward path).

    Differentiating through it gives O(T)-memory Pallas gradients instead of
    materialized [B,H,Tq,Tk] score recompute. kv_mask masks KEYS only
    (reference semantics: pad queries still attend valid keys); the query
    segment is all-ones so q==kv segment exactly where the key is valid.
    """
    qseg = kvseg = None
    if kv_mask is not None:
        qseg = jnp.ones((q.shape[0], q.shape[2]), jnp.int32)
        kvseg = kv_mask.astype(jnp.int32)
    return _library_flash_call(q, k, v, causal, scale, qseg, kvseg)


def library_flash_pad_shapes(Tq: int, Tk: int, block: int = 512):
    """Padded lengths satisfying the library kernel's divisibility (static)."""
    return -(-Tq // block) * block, -(-Tk // block) * block


def _library_flash_padded(q, k, v, causal, scale, kv_mask):
    """Library flash with sequence padding + segment-id masking.

    Dispatched for causal LLM self-attention >= 1024 and long odd head dims
    (ViViT: [B, 12, 3137, 64]), where the library kernel beats XLA's fused
    attention (crossover table in BASELINE.md). Padded q rows are fully
    masked (segment 0) and sliced off; padded k rows get segment 0 so no
    valid query attends them. Callers must keep causal Tq == Tk (the library
    causal mask is top-left aligned; ours is right-aligned — dispatch_plan
    and _bwd_compatible both enforce this).
    """
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    Tq_p, Tk_p = library_flash_pad_shapes(Tq, Tk)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, Tq_p - Tq), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, Tk_p - Tk), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, Tk_p - Tk), (0, 0)))
    if kv_mask is None and (causal or (Tq_p == Tq and Tk_p == Tk)):
        # no segment ids at all: under causality (Tq == Tk, offset 0) every
        # padded key sits after every valid query, so causal masking already
        # excludes the padding — the kernel runs its segment-free fast path.
        # Padded q rows compute garbage and are sliced off below.
        qseg = kvseg = None
    else:
        qseg = (jax.lax.broadcasted_iota(jnp.int32, (B, Tq_p), 1) < Tq).astype(jnp.int32)
        kvseg = (jax.lax.broadcasted_iota(jnp.int32, (B, Tk_p), 1) < Tk).astype(jnp.int32)
        if kv_mask is not None:
            kvseg = kvseg * jnp.pad(kv_mask.astype(jnp.int32), ((0, 0), (0, Tk_p - Tk)))
    out = _library_flash_call(q, k, v, causal, scale, qseg, kvseg)
    return out[:, :, :Tq, :]


def _bwd_compatible(q, k, causal) -> bool:
    """Static check: library kernel constraints (block divisibility).

    ``causal and Tq != Tk`` is excluded: the custom forward right-aligns the
    causal mask (offset Tk-Tq) while the library kernel assumes top-left
    alignment — gradients would belong to a differently-masked function.
    """
    Tq, Tk = q.shape[2], k.shape[2]
    return (
        can_use_pallas()
        and not _INTERPRET
        and (not causal or Tq == Tk)
        and Tq % _pick_block(Tq, 512) == 0
        and Tk % _pick_block(Tk, 512) == 0
        and q.shape[-1] >= 128
    )


def _flash_bwd_rule(causal, scale, block_q, block_k, has_mask, res, g):
    q, k, v, kv_mask = res
    mask = kv_mask if has_mask else None

    if _bwd_compatible(q, k, causal):
        Hk = k.shape[1]

        def lib(q, k, v):
            return _library_flash(q, k, v, causal, scale, mask)

        _, vjp = jax.vjp(lib, q, k, v)
        dq, dk, dv = vjp(g)
        if Hk != q.shape[1]:  # fold repeated-KV-head grads back (GQA)
            rep = q.shape[1] // Hk
            dk = dk.reshape(dk.shape[0], Hk, rep, *dk.shape[2:]).sum(axis=2)
            dv = dv.reshape(dv.shape[0], Hk, rep, *dv.shape[2:]).sum(axis=2)
        return (dq, dk, dv, None)

    def ref(q, k, v):
        return attention_reference(q, k, v, causal=causal, kv_mask=mask, scale=scale)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return (dq, dk, dv, None)


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def dispatch_plan(
    Tq: int,
    Tk: int,
    D: int,
    *,
    causal: bool,
    has_bias: bool,
    has_q_offset: bool,
    impl: str = "auto",
    on_tpu: bool = True,
    has_mask: bool = False,
    self_shaped: bool = False,
) -> str:
    """Static kernel choice: 'small' | 'library' | 'pallas' | 'xla'.

    Pure function of shapes/flags so tests can pin which kernel every model
    path actually runs (training step, serving prefill, towers, decode).
    Measured rules (v5e crossover table in BASELINE.md, 2026-08-16):

    - causal self-attention with ``Tq == Tk >= 1024`` -> library flash kernel
      (beats XLA at every measured LLM shape: serving prefill
      [2,32,1088,128] 2.15 vs 2.63 ms, batched [8,...] 4.65 vs 6.16,
      training [2,32,3072,128] 3.49 vs 19.8). Differentiable: the library
      kernel carries its own Pallas VJP.
    - ``min(Tq,Tk) >= 2048``: our Pallas kernel for ``D % 128 == 0``
      (custom VJP with library backward), library flash for odd head dims
      (ViViT [2,12,3137,64]: 3.26 vs XLA 4.45).
    - everything shorter (vision-tower frames, decode steps) -> XLA fused
      attention, which measures fastest there.
    """
    if impl == "pallas":
        return "pallas"
    if impl == "chunked":
        return "chunked"
    if impl != "auto" or has_bias:
        return "xla"
    if not on_tpu:
        # platforms without the Pallas kernels (CPU-mesh tests, the AOT
        # memory proof): bound memory with the chunked path at exactly the
        # shapes the TPU dispatch would hand to a flash kernel, so compiled
        # memory profiles model the real program
        flash_shape = (causal and Tq == Tk and Tq >= 1024) or min(Tq, Tk) >= 2048
        return "chunked" if flash_shape else "xla"
    if has_q_offset:
        # cache-offset prefill/decode: the library kernel has no q_offset
        # notion, so only the custom kernel (non-VJP direct call) applies;
        # worth it only at long-context cache prefill shapes
        return "pallas" if (min(Tq, Tk) >= 2048 and D % 128 == 0) else "xla"
    if causal and Tq == Tk and Tq >= 1024:
        return "library"
    if min(Tq, Tk) >= 2048:
        if D % 128 == 0:
            return "pallas"
        # library kernel only for non-causal or Tq == Tk: its causal mask is
        # top-left aligned, ours is right-aligned (offset Tk-Tq) — the same
        # mismatch _bwd_compatible documents for the backward. Causal
        # cross-length odd-D falls through to the XLA reference.
        return "library" if (not causal or Tq == Tk) else "xla"
    if (
        not causal and not has_mask and self_shaped
        and Tq == Tk and 224 <= Tq <= 512 and D <= 128
    ):
        # measured on the full towers (v5e 2026-08-16): DINOv2 57.0 -> 55.0,
        # LanguageBind 67.0 -> 64.9 ms; SigLIP's 196-token frames got SLOWER
        # (8.3 -> 9.4) so the lower bound keeps them on XLA
        # vision-tower frame attention: the whole-sequence-per-batch-cell
        # kernel amortizes grid overhead over all heads (see _small_attention)
        return "small"
    return "xla"


def can_use_pallas() -> bool:
    if not _PALLAS_TPU:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    causal: bool = False,
    kv_mask: Optional[Array] = None,
    bias: Optional[Array] = None,
    scale: Optional[float] = None,
    q_offset: Optional[Array] = None,
    impl: str = "auto",
    block_q: int = 512,
    block_k: int = 512,
) -> Array:
    """Fused multi-head attention.

    Args:
      q: ``[B, H, Tq, D]``; k/v: ``[B, Hkv, Tk, D]`` with ``H % Hkv == 0`` (GQA).
      causal: apply causal mask — query i sits at kv position ``q_offset + i``
        (default ``Tk - Tq``: q timeline right-aligned against kv timeline).
      kv_mask: optional ``[B, Tk]`` bool — True where the key position is valid.
      bias: optional additive bias (XLA path only).
      q_offset: absolute kv position of query 0 (traced ok) — used for
        prefill/decode against a longer KV-cache buffer. The q_offset path is
        inference-only (not differentiable through the Pallas kernel).
      impl: 'auto' | 'pallas' | 'xla'.
    """
    D = q.shape[-1]
    scale_val = (D ** -0.5) if scale is None else scale
    Tq, Tk = q.shape[2], k.shape[2]

    # Measured dispatch (see dispatch_plan's docstring and BASELINE.md's
    # crossover table for the per-shape numbers behind the rule).
    plan = dispatch_plan(
        Tq, Tk, D, causal=causal, has_bias=bias is not None,
        has_q_offset=q_offset is not None, impl=impl,
        on_tpu=can_use_pallas() and not _INTERPRET,
        has_mask=kv_mask is not None, self_shaped=q.shape == k.shape,
    )
    if q_offset is not None and getattr(q_offset, "ndim", 0) == 1 and plan == "pallas":
        # per-row q offsets ([B] vector, continuous-batching verify): the
        # Pallas kernel takes a scalar SMEM offset — route to XLA, whose
        # causal mask broadcasts per row
        plan = "xla"
    if plan == "chunked":
        assert bias is None, "additive bias is not supported by the chunked path (use impl='xla')"
        return attention_chunked(
            q, k, v, causal=causal, kv_mask=kv_mask, scale=scale_val, q_offset=q_offset
        )
    if plan == "small":
        return _small_attention(q, k, v, scale_val)
    if plan == "library":
        return _library_flash_padded(q, k, v, causal, scale_val, kv_mask)
    if plan == "pallas":
        assert bias is None, "additive bias is not supported by the Pallas kernel (use impl='xla')"
        if q_offset is not None:
            # cache-aware prefill: direct (non-VJP) kernel call
            return _flash_forward(q, k, v, kv_mask, causal, scale_val, block_q, block_k, q_offset)
        return _flash_attention(
            q, k, v, causal, scale_val, block_q, block_k, kv_mask is not None, kv_mask
        )
    return attention_reference(
        q, k, v, causal=causal, kv_mask=kv_mask, bias=bias, scale=scale_val, q_offset=q_offset
    )
