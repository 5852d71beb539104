"""Pipeline parallelism: microbatched GPipe over the ``pp`` mesh axis.

Capability extension beyond the reference (its distributed story is one
8-GPU FSDP node, reference ``merv/training/strategies/fsdp.py:53-142``; it has
no pipeline mechanism at all). On TPU pods, fsdp-only eventually loses to the
all-gather volume — every chip still streams EVERY layer's weights each step.
Sharding decoder DEPTH over a ``pp`` axis bounds per-chip weight traffic to
``L/pp`` layers and turns the inter-stage hop into a single ``ppermute``
(one ICI neighbor exchange per microbatch per stage boundary), the
collective-permute pipeline pattern GSPMD cannot derive from annotations
alone.

Design (TPU-native, not a torch translation):

- The stacked layer params (every leaf ``[L, ...]``, see
  ``LlamaDecoder.init``) shard their LAYER dim over ``pp``; each device holds
  the contiguous ``L/pp`` layers of its stage.
- The whole schedule lives inside ONE ``jax.shard_map`` that is *manual* over
  ``pp`` only (``axis_names={'pp'}``): data/fsdp/tensor stay GSPMD-auto, so
  the usual ZeRO all-gathers keep working *inside* each stage and pipeline
  composes freely with the other axes.
- GPipe schedule: the batch splits into M microbatches; over ``M + pp - 1``
  ticks, every stage applies its layers to the microbatch it currently holds
  and forwards the result to the next stage via ``lax.ppermute``. Per-token
  side inputs (rope cos/sin) ride the ring alongside the activations so each
  stage always has the tables matching its current microbatch.
- Reverse-differentiable by construction: ``ppermute`` transposes to the
  reversed permutation, so ``jax.grad`` replays the pipeline backward
  (backward GPipe) without a hand-written schedule. Per-layer ``remat``
  composes (the stage body checkpoints each layer like the plain scan path).
- Bubble fraction is the GPipe ``(pp-1)/(M+pp-1)``; raise
  ``microbatches`` to amortize. (1F1B/circular schedules trade this bubble
  for a more intricate schedule — a possible future upgrade; GPipe is chosen
  because AD derives its backward for free.)

Numerics: identical math to the plain layer scan — same layer function, same
dtypes; only the iteration order over (layer, microbatch) changes. Pinned by
``tests/test_pipeline_parallel.py`` (forward + gradient parity vs the
single-device scan).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from merv_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS, PIPE_AXIS

Array = jax.Array
PyTree = Any


def resolve_microbatches(batch: int, pp: int, requested: int = 0) -> Optional[int]:
    """Pick the GPipe microbatch count M.

    ``requested`` > 0 must divide the batch — a mismatch raises instead of
    silently disabling the pipeline (the params are already pp-sharded by
    ``fsdp_specs``; falling back to the plain scan would redundantly
    re-gather the full decoder stack on every chip, an OOM/slowdown with no
    log at exactly the 13B scale pp exists for). With no request, the default
    is ``min(2*pp, batch)`` rounded down to a divisor of ``batch`` (2*pp
    keeps the bubble fraction <= 1/3); batch of 1 still pipelines with M=1.
    """
    if batch <= 0:
        return None
    if requested > 0:
        if batch % requested != 0:
            raise ValueError(
                f"pp_microbatches={requested} does not divide the per-step "
                f"batch {batch}; pick a divisor (or 0 for the default)"
            )
        return requested
    m = min(2 * pp, batch)
    while m > 1 and batch % m != 0:
        m -= 1
    return m


def pipeline_layer_scan(
    layer_fn: Callable[[PyTree, Array, Tuple[Array, Array]], Array],
    h: Array,
    cos_sin: Tuple[Array, Array],
    layers: PyTree,
    mesh: Mesh,
    *,
    microbatches: int,
    remat: bool = False,
    axis: str = PIPE_AXIS,
) -> Array:
    """Run ``h`` through the stacked ``layers`` as a GPipe pipeline over ``axis``.

    - ``layer_fn(lp, h, cos_sin) -> h``: ONE decoder layer (params ``lp`` are a
      single layer's slice of the stack).
    - ``h``: ``[B, T, D]`` activations; ``cos_sin``: pair of ``[B, T, Dh]``
      rope tables (they ride the ring with their microbatch).
    - ``layers``: pytree whose every leaf is stacked ``[L, ...]``; L must be
      divisible by the ``pp`` axis size, B by ``microbatches``.

    Returns ``[B, T, D]`` — the last stage's output, broadcast over ``pp``
    (XLA lowers the cross-stage read to one broadcast collective).
    """
    pp = mesh.shape[axis]
    if pp <= 1:
        raise ValueError("pipeline_layer_scan requires a pp axis > 1 on the mesh")
    B, T, D = h.shape
    L = jax.tree_util.tree_leaves(layers)[0].shape[0]
    M = microbatches
    if L % pp != 0:
        raise ValueError(f"num_layers {L} not divisible by pp={pp}")
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by microbatches={M}")
    mb = B // M

    if remat:
        layer_fn = jax.checkpoint(layer_fn, prevent_cse=False)

    # The activation crosses the shard_map boundary in fp32 and downcasts
    # INSIDE the body. Two reasons: (a) the backward of a replicated-over-pp
    # input is a psum of cotangents over the stages — doing it in fp32 makes
    # the pipeline's gradient accumulation exact at the boundary; (b) XLA's
    # CPU SPMD partitioner CHECK-fails ("Invalid binary instruction opcode
    # copy", hlo_instruction.cc:1585) on that psum when the cotangent is
    # bf16, which would break every virtual-mesh test/dryrun of this path.
    compute_dtype = h.dtype
    boundary_dtype = jnp.float32 if jnp.issubdtype(compute_dtype, jnp.floating) else compute_dtype

    def body(layers_local: PyTree, h_mb: Array, cos_mb: Array, sin_mb: Array) -> Array:
        h_mb = h_mb.astype(compute_dtype)
        idx = jax.lax.axis_index(axis)
        perm = [(d, d + 1) for d in range(pp - 1)]

        def stage(h: Array, cs: Tuple[Array, Array]) -> Array:
            def f(carry, lp):
                return layer_fn(lp, carry, cs), None

            out, _ = jax.lax.scan(f, h, layers_local)
            return out

        state_h = jnp.zeros((mb, T, D), h_mb.dtype)
        state_c = jnp.zeros_like(cos_mb[0])
        state_s = jnp.zeros_like(sin_mb[0])
        outbuf = jnp.zeros((M, mb, T, D), h_mb.dtype)

        def tick(carry, t):
            hh, cc, ss, out = carry
            t_in = jnp.minimum(t, M - 1)
            # stage 0 injects microbatch t; later stages use the ring input
            hh = jnp.where(idx == 0, h_mb[t_in], hh)
            cc = jnp.where(idx == 0, cos_mb[t_in], cc)
            ss = jnp.where(idx == 0, sin_mb[t_in], ss)
            hh = stage(hh, (cc, ss))
            # only the LAST stage's writes are read (out_specs selects its
            # shard); ticks t < pp-1 write warm-up garbage at index 0 that
            # tick pp-1's real microbatch-0 result overwrites
            o_idx = jnp.clip(t - (pp - 1), 0, M - 1)
            out = jax.lax.dynamic_update_slice(out, hh[None], (o_idx, 0, 0, 0))
            hh = jax.lax.ppermute(hh, axis, perm)
            cc = jax.lax.ppermute(cc, axis, perm)
            ss = jax.lax.ppermute(ss, axis, perm)
            return (hh, cc, ss, out), None

        (_, _, _, outbuf), _ = jax.lax.scan(
            tick, (state_h, state_c, state_s, outbuf), jnp.arange(M + pp - 1, dtype=jnp.int32)
        )
        return outbuf[None]  # [1, M, mb, T, D]; stacked over pp by out_specs

    cos, sin = cos_sin
    h_mb = h.astype(boundary_dtype).reshape(M, mb, T, D)
    cos_mb = cos.reshape(M, mb, *cos.shape[1:])
    sin_mb = sin.reshape(M, mb, *sin.shape[1:])
    # keep the microbatch dim replicated and the per-microbatch batch dim on
    # data/fsdp (otherwise GSPMD may shard M over data, turning each tick's
    # microbatch gather into a cross-replica collective)
    h_mb, cos_mb, sin_mb = (_constrain_microbatch(x, mesh) for x in (h_mb, cos_mb, sin_mb))

    layer_specs = jax.tree_util.tree_map(lambda _: P(axis), layers)
    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(layer_specs, P(), P(), P()),
        out_specs=P(axis),
        axis_names={axis},
        check_vma=False,
    )(layers, h_mb, cos_mb, sin_mb)
    return out[pp - 1].reshape(B, T, D)


def _constrain_microbatch(x: Array, mesh: Mesh) -> Array:
    """[M, mb, ...]: replicate M, shard mb over data/fsdp when divisible."""
    axes = [a for a in (DATA_AXIS, FSDP_AXIS) if mesh.shape.get(a, 1) > 1]
    if not axes:
        return x
    total = int(np.prod([mesh.shape[a] for a in axes]))
    if x.shape[1] % total != 0:
        return x
    spec = [None] * x.ndim
    spec[1] = tuple(axes) if len(axes) > 1 else axes[0]
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
