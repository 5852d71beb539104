"""Ring attention: sequence/context-parallel attention over the ``sp`` mesh axis.

Capability extension beyond the reference (SURVEY §5.7: the reference has NO
sequence parallelism — it avoids long sequences architecturally by resampling
every video to 1024 visual tokens and capping ``llm_max_length`` at 2048,
reference ``merv/conf/models.py:117-119``). Raising frame counts or projector
token budgets past single-chip attention memory needs the sequence dim sharded
over devices; this module provides the TPU-native mechanism:

- activations shard the sequence dim over the mesh's ``sp`` axis;
- each device computes block attention of its local queries against one
  key/value block at a time while the K/V blocks rotate around the ring with
  ``jax.lax.ppermute`` (ICI neighbor exchange — bandwidth-optimal on a TPU
  torus), merging partials with the online-softmax rule flash attention uses;
- the whole thing lives inside ``shard_map`` so XLA overlaps the ppermute with
  the current block's matmuls (async collective scheduling).

Memory per device: O(S/n) queries + one rotating K/V block, instead of the
all-gathered O(S) that GSPMD sharding propagation would produce for a
sequence-sharded attention.

Differentiable by construction (``lax.scan`` + ``ppermute`` are reverse-mode
transposable), so the training step can run context-parallel without a custom
backward kernel: the backward pass replays the ring in reverse.

Numerics: fp32 running max/denominator/accumulator (what the Pallas flash
kernel keeps in VMEM), bf16 MXU matmuls with fp32 accumulation. Matches
``attention_reference`` to fp32 roundoff.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from merv_tpu.ops.attention import DEFAULT_MASK_VALUE
from merv_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS, SEQ_AXIS, TENSOR_AXIS

Array = jax.Array


def _ring_q_block(sq: int, target: int) -> int:
    """Largest divisor of ``sq`` <= target (q chunks must tile the local shard)."""
    return next(b for b in range(min(target, sq), 0, -1) if sq % b == 0)


def _ring_local(
    q: Array,
    k: Array,
    v: Array,
    *,
    n: int,
    axis_name: str,
    causal: bool,
    scale: float,
    block_q: int = 512,
) -> Array:
    """Per-device ring attention body (runs inside shard_map).

    q: [B, H, Sq, D] local query shard (ring position ``axis_index``);
    k/v: [B, Hk, Sk, D] local key/value shard, rotated n times around the ring.

    Memory: the local query shard is processed in ``block_q``-row chunks so
    live scores are ``[B, H, block_q, Sk]`` instead of ``[B, H, Sq, Sk]`` —
    without this, a long-context shard (the very case sequence parallelism
    exists for) would materialize an (S/n)^2 fp32 score block per ring step.
    The chunk update is remat'd (``jax.checkpoint``) so reverse-mode AD
    recomputes each chunk's scores instead of saving them per ring step (the
    flash-attention trade; per-step saved state stays O(S/n) in the carries).

    A causal note: blocks with ``src > idx`` are fully masked, but the ring
    still runs them — every device must ppermute in lockstep each step, so
    skipping the matmul saves energy, not wall-clock. Load-balancing the
    causal ring (zigzag block order) is the known fix and a possible future
    upgrade.
    """
    B, H, Sq, D = q.shape
    Hk = k.shape[1]
    if Hk != H:  # GQA: repeat kv heads (block-sized transient, not O(S))
        k = jnp.repeat(k, H // Hk, axis=1)
        v = jnp.repeat(v, H // Hk, axis=1)
    Sk = k.shape[2]
    idx = jax.lax.axis_index(axis_name)
    bq = _ring_q_block(Sq, block_q)
    nq = Sq // bq
    q_pos = (idx * Sq + jnp.arange(Sq, dtype=jnp.int32)).reshape(nq, bq)
    q_chunks = q.reshape(B, H, nq, bq, D).transpose(2, 0, 1, 3, 4)  # [nq,B,H,bq,D]

    o0 = jnp.zeros((nq, B, H, bq, D), jnp.float32)
    m0 = jnp.full((nq, B, H, bq), DEFAULT_MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((nq, B, H, bq), jnp.float32)
    perm = [(d, (d + 1) % n) for d in range(n)]

    def chunk_update(qc, qpos_c, oc, mc, lc, kc, vc, k_pos):
        """Online-softmax update of one q chunk against the current kv block.
        qc [B,H,bq,D]; oc fp32 [B,H,bq,D]; mc/lc fp32 [B,H,bq]."""
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qc, kc, preferred_element_type=jnp.float32
        ) * scale
        if causal:
            valid = (qpos_c[:, None] >= k_pos[None, :]).astype(jnp.float32)
            s = jnp.where(valid[None, None].astype(bool), s, DEFAULT_MASK_VALUE)
        m_blk = jnp.max(s, axis=-1)
        m_new = jnp.maximum(mc, m_blk)
        p = jnp.exp(s - m_new[..., None])
        if causal:
            # a block whose keys are ALL masked for some query row leaves that
            # row's m at the MASK floor, making exp(MASK - MASK) = 1 — zero the
            # masked entries explicitly so they contribute nothing to l/o
            p = p * valid[None, None]
        alpha = jnp.exp(mc - m_new)
        l_new = lc * alpha + jnp.sum(p, axis=-1)
        pv = jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(vc.dtype), vc, preferred_element_type=jnp.float32
        )
        o_new = oc * alpha[..., None] + pv
        return o_new, m_new, l_new

    chunk_update = jax.checkpoint(chunk_update, prevent_cse=False)

    def body(carry, j):
        o, m, l, kc, vc = carry
        # device ``idx`` holds block ``src`` at step j (each step every device
        # forwards its current block to its +1 ring neighbor)
        src = (idx - j) % n
        k_pos = src * Sk + jnp.arange(Sk, dtype=jnp.int32)

        def per_chunk(_, xs):
            qc, qpos_c, oc, mc, lc = xs
            return _, chunk_update(qc, qpos_c, oc, mc, lc, kc, vc, k_pos)

        _, (o, m, l) = jax.lax.scan(per_chunk, 0, (q_chunks, q_pos, o, m, l))
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (o, m, l, kc, vc), None

    (o, _, l, _, _), _ = jax.lax.scan(
        body, (o0, m0, l0, k, v), jnp.arange(n, dtype=jnp.int32)
    )
    # causal self-attention guarantees l >= 1 (the diagonal); the maximum is a
    # belt-and-braces guard for fully-masked rows in exotic layouts
    o = o / jnp.maximum(l, 1e-30)[..., None]
    return o.transpose(1, 2, 0, 3, 4).reshape(B, H, Sq, D).astype(q.dtype)


def _batch_axes(mesh: Mesh, batch: int) -> Tuple[str, ...]:
    """Greedy data/fsdp batch axes that divide ``batch`` (mirrors
    ``constrain_batch_dim``'s divisibility no-op for tiny test batches)."""
    axes = []
    remaining = batch
    for a in (DATA_AXIS, FSDP_AXIS):
        size = mesh.shape.get(a, 1)
        if size > 1 and remaining % size == 0:
            axes.append(a)
            remaining //= size
    return tuple(axes)


def ring_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    sp_axis: str = SEQ_AXIS,
    block_q: int = 512,
) -> Array:
    """Sequence-parallel attention over ``mesh``'s ``sp`` axis.

    Global-view API (call from inside a jitted program): q [B, H, S, D],
    k/v [B, Hk, S, D] logically sequence-sharded over ``sp``; returns [B, H, S, D]
    with the same sharding. Falls back to a single-device ring (= plain
    attention semantics) when the axis is absent or 1.

    Right-padding contract: like the decoder's no-cache path, no kv mask is
    applied — causal masking + right padding keep valid queries off pad keys
    (``transformer.py.__call__`` docstring). Pad rows compute garbage nothing
    reads.
    """
    n = mesh.shape.get(sp_axis, 1)
    scale = float(q.shape[-1] ** -0.5) if scale is None else scale
    if n <= 1:
        from merv_tpu.ops.attention import attention

        return attention(q, k, v, causal=causal, scale=scale)

    B, H, S, D = q.shape
    Hk = k.shape[1]
    if S % n != 0:
        raise ValueError(f"sequence length {S} not divisible by sp={n}")
    if H % Hk != 0:
        raise ValueError(f"num_heads {H} not a multiple of kv heads {Hk}")

    bspec = _batch_axes(mesh, B)
    bspec_p = bspec if len(bspec) != 1 else bspec[0]
    tp = mesh.shape.get(TENSOR_AXIS, 1)
    # shard heads over tensor only when BOTH q and kv head counts divide
    hspec = TENSOR_AXIS if (tp > 1 and H % tp == 0 and Hk % tp == 0) else None
    spec = P(bspec_p if bspec else None, hspec, sp_axis, None)

    local = functools.partial(
        _ring_local, n=n, axis_name=sp_axis, causal=causal, scale=scale, block_q=block_q
    )
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
    )(q, k, v)


def constrain_seq_dim(x: Array, mesh: Optional[Mesh], *, seq_dim: int = 1) -> Array:
    """Pin activation ``x``'s sequence dim to the ``sp`` axis (batch dim 0 to
    data/fsdp as usual). No-op when the mesh has no sp axis or shapes don't
    divide — mirrors ``constrain_batch_dim``'s tolerance for tiny tests."""
    if mesh is None or mesh.shape.get(SEQ_AXIS, 1) <= 1:
        return x
    if x.ndim <= seq_dim or x.shape[seq_dim] % mesh.shape[SEQ_AXIS] != 0:
        return x
    bspec = _batch_axes(mesh, x.shape[0])
    spec = [None] * x.ndim
    if bspec:
        spec[0] = bspec if len(bspec) > 1 else bspec[0]
    spec[seq_dim] = SEQ_AXIS
    return jax.lax.with_sharding_constraint(
        x, jax.sharding.NamedSharding(mesh, P(*spec))
    )
