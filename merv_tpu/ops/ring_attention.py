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

    A causal note: in THIS (natural-layout) ring, blocks with ``src > idx``
    are fully masked but still computed — every device must ppermute in
    lockstep each step, so skipping the matmul alone saves energy, not
    wall-clock. :func:`_ring_local_zigzag` is the load-balanced fix the
    decoder uses for causal sp (see its docstring); this natural-order body
    remains the non-causal path and the fallback when the sequence doesn't
    tile the zigzag layout.
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


def zigzag_perm(seq: int, n: int) -> np.ndarray:
    """Gather indices mapping natural token order -> zigzag layout.

    The sequence splits into ``2n`` chunks; ring position ``d`` owns chunks
    ``d`` and ``2n-1-d`` (one early, one late). Under causal attention this
    equalizes useful work across the ring: with natural contiguous shards,
    device 0's keys are visible to everyone while device n-1's are visible
    to almost no one, so half of every lockstep ring step is masked waste on
    SOME device; with the zigzag pairing every device does exactly half a
    block of fully-visible work per step (see _ring_local_zigzag).
    Returns ``perm`` with ``x_zigzag = x[..., perm, :]``; invert with
    ``np.argsort(perm)``.
    """
    assert seq % (2 * n) == 0, (seq, n)
    c = seq // (2 * n)
    chunks = np.arange(seq).reshape(2 * n, c)
    order = [i for d in range(n) for i in (d, 2 * n - 1 - d)]
    return chunks[order].reshape(-1)


def _ring_local_zigzag(
    q: Array,
    k: Array,
    v: Array,
    *,
    n: int,
    axis_name: str,
    scale: float,
    block_q: int = 512,
) -> Array:
    """Load-balanced CAUSAL ring body; inputs are in zigzag layout.

    Device ``d``'s local rows are [chunk d ; chunk 2n-1-d] of the global
    sequence (``zigzag_perm``). Per ring step ``j > 0`` the incoming kv block
    (originally device ``s = (d-j) mod n``) decomposes against the local
    queries into exactly HALF a block of fully-visible work — uniformly
    across devices, with no masked waste:

    - ``s < d`` (no ring wraparound): the incoming EARLY chunk (index s)
      precedes both local q chunks, the incoming LATE chunk (2n-1-s) follows
      both -> ALL local queries attend the early kv half. [2c x c]
    - ``s > d`` (wrapped): both incoming chunks lie between the local pair
      (after chunk d, before chunk 2n-1-d) -> the local LATE q chunk attends
      the WHOLE incoming block; the early q chunk attends none. [c x 2c]

    Equal FLOPs either way => per-step wall-clock is half the natural-order
    ring's full block, and no device idles. ``lax.cond`` picks the branch at
    runtime per device (same output shapes, different internals). Step 0
    (self block) runs the position-masked diagonal update. The q side
    streams in ``block_q`` chunks with remat, like the natural-order body.

    Differentiable by construction (cond/scan/ppermute all transpose).
    """
    B, H, Sq, D = q.shape
    Hk = k.shape[1]
    if Hk != H:
        k = jnp.repeat(k, H // Hk, axis=1)
        v = jnp.repeat(v, H // Hk, axis=1)
    assert Sq % 2 == 0 and k.shape[2] == Sq, (q.shape, k.shape)
    c = Sq // 2
    idx = jax.lax.axis_index(axis_name)
    bq = _ring_q_block(c, block_q)  # chunks must tile each c-row half
    nq = Sq // bq
    nqh = nq // 2
    # local positions: [chunk idx ; chunk 2n-1-idx]
    pos = jnp.concatenate([
        idx * c + jnp.arange(c, dtype=jnp.int32),
        (2 * n - 1 - idx) * c + jnp.arange(c, dtype=jnp.int32),
    ]).reshape(nq, bq)
    q_chunks = q.reshape(B, H, nq, bq, D).transpose(2, 0, 1, 3, 4)

    o0 = jnp.zeros((nq, B, H, bq, D), jnp.float32)
    m0 = jnp.full((nq, B, H, bq), DEFAULT_MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((nq, B, H, bq), jnp.float32)
    perm = [(d, (d + 1) % n) for d in range(n)]

    def upd(qc, oc, mc, lc, kc, vc, valid=None):
        """Online-softmax update; ``valid`` [bq, Sk] bool or None (all-visible)."""
        s = jnp.einsum("bhqd,bhkd->bhqk", qc, kc, preferred_element_type=jnp.float32) * scale
        if valid is not None:
            s = jnp.where(valid[None, None], s, DEFAULT_MASK_VALUE)
        m_blk = jnp.max(s, axis=-1)
        m_new = jnp.maximum(mc, m_blk)
        p = jnp.exp(s - m_new[..., None])
        if valid is not None:
            p = p * valid[None, None].astype(jnp.float32)
        alpha = jnp.exp(mc - m_new)
        l_new = lc * alpha + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vc.dtype), vc, preferred_element_type=jnp.float32)
        return oc * alpha[..., None] + pv, m_new, l_new

    upd = jax.checkpoint(upd, prevent_cse=False, static_argnums=())

    # --- step 0: self block, position-masked (the two diagonals + qb x ka) --
    k_pos0 = pos.reshape(-1)

    def self_chunk(_, xs):
        qc, pc, oc, mc, lc = xs
        valid = pc[:, None] >= k_pos0[None, :]
        return _, upd(qc, oc, mc, lc, k, v, valid)

    _, (o, m, l) = jax.lax.scan(self_chunk, 0, (q_chunks, pos, o0, m0, l0))
    kc0 = jax.lax.ppermute(k, axis_name, perm)
    vc0 = jax.lax.ppermute(v, axis_name, perm)

    # --- steps 1..n-1: half-block updates, branch by wraparound ------------
    def body(carry, j):
        o, m, l, kc, vc = carry
        src = (idx - j) % n

        def no_wrap(o, m, l):
            # all local queries x the incoming EARLY kv half, fully visible
            ka, va = kc[:, :, :c], vc[:, :, :c]

            def per_chunk(_, xs):
                qc, oc, mc, lc = xs
                return _, upd(qc, oc, mc, lc, ka, va)

            _, (o, m, l) = jax.lax.scan(per_chunk, 0, (q_chunks, o, m, l))
            return o, m, l

        def wrap(o, m, l):
            # the local LATE q half x the WHOLE incoming block, fully visible
            def per_chunk(_, xs):
                qc, oc, mc, lc = xs
                return _, upd(qc, oc, mc, lc, kc, vc)

            _, late = jax.lax.scan(
                per_chunk, 0, (q_chunks[nqh:], o[nqh:], m[nqh:], l[nqh:])
            )
            return (
                jnp.concatenate([o[:nqh], late[0]]),
                jnp.concatenate([m[:nqh], late[1]]),
                jnp.concatenate([l[:nqh], late[2]]),
            )

        o, m, l = jax.lax.cond(src < idx, no_wrap, wrap, o, m, l)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (o, m, l, kc, vc), None

    if n > 1:
        (o, m, l, _, _), _ = jax.lax.scan(
            body, (o, m, l, kc0, vc0), jnp.arange(1, n, dtype=jnp.int32)
        )
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
    zigzag: bool = False,
) -> Array:
    """Sequence-parallel attention over ``mesh``'s ``sp`` axis.

    Global-view API (call from inside a jitted program): q [B, H, S, D],
    k/v [B, Hk, S, D] logically sequence-sharded over ``sp``; returns [B, H, S, D]
    with the same sharding. Falls back to a single-device ring (= plain
    attention semantics) when the axis is absent or 1.

    ``zigzag=True`` (causal only, S % 2n == 0): inputs are ALREADY in the
    ``zigzag_perm`` token order (the caller permutes once for the whole layer
    stack — permuting here per call would pay an all-to-all per layer) and
    the output returns in that same order. Halves per-step ring compute (see
    ``_ring_local_zigzag``).

    Right-padding contract: like the decoder's no-cache path, no kv mask is
    applied — causal masking + right padding keep valid queries off pad keys
    (``transformer.py.__call__`` docstring). Pad rows compute garbage nothing
    reads. This holds under zigzag too: the ring masks by ORIGINAL physical
    indices (which travel with the tokens through the permutation), so pad
    keys keep their late indices and stay invisible to every valid query.
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

    if zigzag:
        if not causal:
            raise ValueError("zigzag layout only applies to causal ring attention")
        if S % (2 * n) != 0:
            raise ValueError(f"sequence length {S} not divisible by 2*sp={2 * n} (zigzag)")
        local = functools.partial(
            _ring_local_zigzag, n=n, axis_name=sp_axis, scale=scale, block_q=block_q
        )
    else:
        local = functools.partial(
            _ring_local, n=n, axis_name=sp_axis, causal=causal, scale=scale, block_q=block_q
        )

    # When q/k/v are REPLICATED over some >1 mesh axis (e.g. a batch that
    # doesn't divide data*fsdp), the backward of that replicated input is a
    # psum of cotangents over that axis — which XLA's CPU SPMD partitioner
    # CHECK-fails on in bf16 ("Invalid binary instruction opcode copy", same
    # bug parallel/pipeline.py documents). Cross the boundary in fp32 and
    # downcast inside only in that (degenerate, tiny-test) case; the common
    # fully-sharded case keeps the bf16 boundary.
    covered = set(bspec) | ({TENSOR_AXIS} if hspec else set()) | {sp_axis}
    leftover = [a for a, s in mesh.shape.items() if s > 1 and a not in covered]
    upcast = bool(leftover) and q.dtype == jnp.bfloat16
    if upcast:
        inner = local
        compute_dtype = q.dtype

        def local(qq, kk, vv):  # noqa: F811
            return inner(
                qq.astype(compute_dtype), kk.astype(compute_dtype), vv.astype(compute_dtype)
            )

        q, k, v = (x.astype(jnp.float32) for x in (q, k, v))

    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
    )(q, k, v)


def sharded_cache_attention(
    q: Array,
    k: Array,
    v: Array,
    kv_mask: Optional[Array],
    mesh: Mesh,
    *,
    q_offset: Array,
    scale: Optional[float] = None,
    sp_axis: str = SEQ_AXIS,
) -> Array:
    """Serving attention against a KV cache SHARDED over the ``sp`` axis.

    Long-video serving capability (beyond the reference, whose contexts cap
    at 2048): a KV cache too large for one chip shards its SEQUENCE dim over
    ``sp``. No ring is needed at serve time — the cache never moves: queries
    are replicated, every chip computes block attention of all queries
    against its local cache shard, and the partial (o, m, l) statistics merge
    with one ``pmax`` + two ``psum``s (the online-softmax merge across
    chips). Per-chip compute AND memory are L/n of the full cache.

    q [B, H, T, D] (replicated over sp); k/v [B, Hk, L, D] sharded on dim 2;
    kv_mask [B, L] (sharded on dim 1) marks valid cache positions; q_offset
    (traced scalar, or a [B] vector for per-slot continuous-batching caches)
    is each row's query-0 absolute cache position — causal masking is
    ``k_pos <= q_offset[b] + i`` exactly like the XLA cache path
    (``attention(..., q_offset=cache_len)``). Per-slot offsets compose the
    continuous-batching engine with the sp-sharded cache: pointers replicate,
    only the cache's sequence dim shards.
    """
    B, H, T, D = q.shape
    Hk, L = k.shape[1], k.shape[2]
    n = mesh.shape.get(sp_axis, 1)
    scale = float(D ** -0.5) if scale is None else scale
    if n <= 1:
        from merv_tpu.ops.attention import attention

        return attention(q, k, v, causal=True, kv_mask=kv_mask, scale=scale, q_offset=q_offset)
    if L % n != 0:
        raise ValueError(f"cache length {L} not divisible by sp={n}")
    if H % Hk != 0:
        raise ValueError(f"num_heads {H} not a multiple of kv heads {Hk}")
    Lloc = L // n

    if kv_mask is None:
        kv_mask = jnp.ones((B, L), jnp.bool_)

    bspec = _batch_axes(mesh, B)
    bspec_p = None if not bspec else (bspec[0] if len(bspec) == 1 else bspec)
    tp = mesh.shape.get(TENSOR_AXIS, 1)
    hspec = TENSOR_AXIS if (tp > 1 and H % tp == 0 and Hk % tp == 0) else None
    qspec = P(bspec_p, hspec, None, None)
    kvspec = P(bspec_p, hspec, sp_axis, None)
    mspec = P(bspec_p, sp_axis)

    def local(q, kc, vc, mask_c, qoff):
        if kc.shape[1] != q.shape[1]:
            kc = jnp.repeat(kc, q.shape[1] // kc.shape[1], axis=1)
            vc = jnp.repeat(vc, q.shape[1] // vc.shape[1], axis=1)
        idx = jax.lax.axis_index(sp_axis)
        k_pos = idx * Lloc + jnp.arange(Lloc, dtype=jnp.int32)
        q_pos = qoff[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]  # [B, T]
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kc, preferred_element_type=jnp.float32) * scale
        valid = mask_c[:, None, None, :] & (
            k_pos[None, None, :] <= q_pos[:, :, None]
        )[:, None]
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=-1)
        p = jnp.exp(s - m[..., None]) * valid.astype(jnp.float32)
        l = jnp.sum(p, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vc.dtype), vc, preferred_element_type=jnp.float32)
        # cross-chip online-softmax merge
        m_g = jax.lax.pmax(m, sp_axis)
        alpha = jnp.exp(m - m_g)
        l_g = jax.lax.psum(l * alpha, sp_axis)
        o_g = jax.lax.psum(o * alpha[..., None], sp_axis)
        return (o_g / jnp.maximum(l_g, 1e-30)[..., None]).astype(q.dtype)

    # scalar offsets broadcast to a per-row vector (sharded with the batch):
    # one shard_map body serves both the lockstep and the per-slot cache
    qoff = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32).reshape(-1), (B,))
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(qspec, kvspec, kvspec, mspec, P(bspec_p)),
        out_specs=qspec,
        check_vma=False,
    )(q, k, v, kv_mask, qoff)


def constrain_cache_seq(buf: Optional[Array], mesh: Optional[Mesh], *, seq_dim: int = 3) -> Array:
    """Pin a stacked cache buffer's sequence dim ([L, B, Hkv, max_len, D] by
    default) to the ``sp`` axis; every other dim replicated (the layer dim
    must NOT pick up batch axes — the layer scan indexes it sequentially).
    No-op when the mesh has no sp axis or the dim doesn't divide."""
    if buf is None or mesh is None or mesh.shape.get(SEQ_AXIS, 1) <= 1:
        return buf
    if buf.shape[seq_dim] % mesh.shape[SEQ_AXIS] != 0:
        return buf
    spec = [None] * buf.ndim
    spec[seq_dim] = SEQ_AXIS
    return jax.lax.with_sharding_constraint(
        buf, jax.sharding.NamedSharding(mesh, P(*spec))
    )


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
