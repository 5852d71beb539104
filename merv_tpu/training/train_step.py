"""The jitted, sharded training step.

TPU-native replacement for the reference hot loop (reference
``merv/training/strategies/base_strategy.py:208-271``): instead of an
imperative autocast->backward->clip->step sequence per microbatch, ONE compiled
XLA program performs gradient accumulation (``lax.scan`` over microbatches,
reference ``:227-241``), global-norm clipping (``fsdp.py:324-326``), the AdamW
update, and the collectives FSDP would have issued — all fused by XLA SPMD
from the sharding annotations.

Sharding strategies (names kept from the reference configs):
- ``fsdp-full-shard``   (ZeRO-3): params + optimizer state sharded over `fsdp`
- ``fsdp-shard-grad-op``(ZeRO-2): params replicated, optimizer state sharded
- ``ddp``               : everything replicated, grads all-reduced
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from merv_tpu.parallel import batch_spec, fsdp_specs, replicated_specs, to_named_shardings

PyTree = Any
Array = jax.Array


@dataclass
class TrainState:
    """Flat functional train state (params/opt_state/step as pytrees)."""

    params: PyTree
    opt_state: PyTree
    step: Array


def make_loss_fn(
    model: Any,
    remat: bool = True,
    video_transforms: Optional[Any] = None,
    loss_chunk_size: Optional[int] = None,
) -> Callable[[PyTree, Dict[str, Any]], Array]:
    """Multimodal next-token loss over one microbatch dict.

    When ``video_transforms`` is given, ``batch["video_values"]`` holds raw
    uint8 host-geometry frames [B, F, S, S, C] and normalize/transpose fuse
    into this jitted program (``VideoTransform.device_finish``).

    ``loss_chunk_size`` streams the CE loss over token blocks instead of
    materializing [B, T, vocab] logits (required at 7B full scale — see
    ``chunked_causal_lm_loss``); None keeps the direct path.
    """

    def loss_fn(params: PyTree, batch: Dict[str, Any]) -> Array:
        videos = batch["video_values"]
        if video_transforms is not None:
            videos = [tf.device_finish(v) for tf, v in zip(video_transforms, videos)]
        out = model.forward(
            params,
            batch["input_ids"],
            batch["attention_mask"],
            videos,
            labels=batch["labels"],
            is_image=batch.get("is_image"),
            is_multimodal=batch.get("is_multimodal"),
            remat=remat,
            loss_chunk_size=loss_chunk_size,
        )
        return out["loss"]

    return loss_fn


def make_train_step(
    loss_fn: Callable[[PyTree, Dict[str, Any]], Array],
    tx: optax.GradientTransformation,
    grad_accumulation_steps: int = 1,
    trainable_mask: Optional[PyTree] = None,
) -> Callable[[TrainState, Dict[str, Any]], Tuple[TrainState, Dict[str, Array]]]:
    """Build the (un-jitted) train step; caller jits with shardings.

    With accumulation, batch leaves are shaped [accum, micro, ...] and a
    lax.scan averages gradients — the naive mean the reference documents
    (base_strategy.py:227-241), exact when microbatches are equal-sized.

    ``trainable_mask`` stop-gradients frozen leaves inside the loss so XLA
    prunes their dW GEMMs entirely (align stage: skips every LLM weight-grad
    matmul while activation gradients still flow to the spliced visual
    tokens) — the functional analogue of requires_grad=False.
    """

    if trainable_mask is not None:
        inner_loss = loss_fn

        def loss_fn(params: PyTree, batch: Dict[str, Any]) -> Array:  # noqa: F811
            masked = jax.tree_util.tree_map(
                lambda p, t: p if t else jax.lax.stop_gradient(p), params, trainable_mask
            )
            return inner_loss(masked, batch)

    # with a trainable mask, frozen leaves never carry fp32 accumulation
    # buffers (a 7B frozen LLM would otherwise cost ~28GB of zero gradients)
    tmap = jax.tree_util.tree_map

    def _zeros_carry(params: PyTree) -> PyTree:
        if trainable_mask is None:
            return tmap(lambda p: jnp.zeros_like(p, jnp.float32), params)
        return tmap(
            lambda p, t: jnp.zeros_like(p, jnp.float32) if t else jnp.zeros((), jnp.float32),
            params, trainable_mask,
        )

    def _accumulate(carry: PyTree, grads: PyTree) -> PyTree:
        if trainable_mask is None:
            return tmap(jnp.add, carry, grads)
        return tmap(lambda c, g, t: c + g if t else c, carry, grads, trainable_mask)

    def _finalize(carry: PyTree, params: PyTree, n: float) -> PyTree:
        if trainable_mask is None:
            return tmap(lambda g: g / n, carry)
        return tmap(
            lambda c, p, t: c / n if t else jnp.zeros_like(p, jnp.float32),
            carry, params, trainable_mask,
        )

    def compute_grads(params: PyTree, batch: Dict[str, Any]) -> Tuple[Array, PyTree]:
        if grad_accumulation_steps == 1:
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            return loss, grads

        def micro(carry, mb):
            loss_sum, grad_sum = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, mb)
            return (loss_sum + loss, _accumulate(grad_sum, grads)), None

        (loss_sum, grad_sum), _ = jax.lax.scan(
            micro, (jnp.zeros((), jnp.float32), _zeros_carry(params)), batch
        )
        n = float(grad_accumulation_steps)
        return loss_sum / n, _finalize(grad_sum, params, n)

    def train_step(state: TrainState, batch: Dict[str, Any]) -> Tuple[TrainState, Dict[str, Array]]:
        loss, grads = compute_grads(state.params, batch)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "step": state.step + 1,
        }
        return TrainState(new_params, new_opt_state, state.step + 1), metrics

    return train_step


# ---------------------------------------------------------------------------
# Sharding the train state
# ---------------------------------------------------------------------------


def train_state_specs(
    state: TrainState,
    mesh: Mesh,
    strategy: str = "fsdp-full-shard",
) -> TrainState:
    """PartitionSpec pytrees for (params, opt_state, step) under a strategy."""
    if strategy == "fsdp-full-shard":
        param_specs = fsdp_specs(state.params, mesh)
    elif strategy in ("fsdp-shard-grad-op", "ddp"):
        param_specs = replicated_specs(state.params)
    else:
        raise ValueError(f"Train Strategy `{strategy}` is not supported!")

    if strategy == "ddp":
        opt_specs = jax.tree_util.tree_map(lambda _: P(), state.opt_state)
    else:
        # optimizer-state leaves mirror parameter shapes (mu/nu): match each
        # by its trailing param path inside the optax state wrappers so its
        # sharding is IDENTICAL to the param's (incl. any override rules);
        # scalar counts replicate
        def norm_key(k) -> str:
            for attr in ("key", "name", "idx"):
                if hasattr(k, attr):
                    return str(getattr(k, attr))
            return str(k)

        flat_param_specs = {
            tuple(norm_key(k) for k in path): spec
            for path, spec in jax.tree_util.tree_flatten_with_path(
                fsdp_specs(state.params, mesh), is_leaf=lambda x: isinstance(x, P)
            )[0]
        }

        def opt_spec(path, leaf):
            if getattr(leaf, "ndim", 0) == 0:
                return P()
            key = tuple(norm_key(k) for k in path)
            for plen in range(len(key)):
                if key[plen:] in flat_param_specs:
                    return flat_param_specs[key[plen:]]
            from merv_tpu.parallel.sharding import infer_fsdp_spec

            return infer_fsdp_spec(leaf.shape, mesh.shape["fsdp"])

        opt_specs = jax.tree_util.tree_map_with_path(opt_spec, state.opt_state)

    return TrainState(param_specs, opt_specs, P())


def shard_train_state(state: TrainState, mesh: Mesh, strategy: str = "fsdp-full-shard") -> Tuple[TrainState, TrainState]:
    """Place the train state on the mesh; returns (sharded_state, specs)."""
    specs = train_state_specs(state, mesh, strategy)
    sharded = TrainState(
        jax.device_put(state.params, to_named_shardings(specs.params, mesh)),
        jax.device_put(state.opt_state, to_named_shardings(specs.opt_state, mesh)),
        jax.device_put(state.step, NamedSharding(mesh, P())),
    )
    return sharded, specs


def jit_train_step(
    train_step: Callable,
    specs: TrainState,
    mesh: Mesh,
) -> Callable:
    """jit the step with explicit state shardings (donates the state).

    Batch shardings are inherited from the arrays themselves — place batches
    with :func:`merv_tpu.parallel.batch_sharding` before calling.

    The activation-constraint mesh is scoped to the traced body (the
    ``with_sharding_constraint`` ops inside the model record the mesh at TRACE
    time), so constructing a training step never leaks a mesh into later
    serving/eval jits in the same process.
    """
    from merv_tpu.parallel.sharding import activation_mesh

    state_shardings = TrainState(
        to_named_shardings(specs.params, mesh),
        to_named_shardings(specs.opt_state, mesh),
        NamedSharding(mesh, P()),
    )

    def wrapped(state: TrainState, batch: Dict[str, Any]):
        with activation_mesh(mesh):
            return train_step(state, batch)

    return jax.jit(
        wrapped,
        in_shardings=(state_shardings, None),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,),
    )


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)
