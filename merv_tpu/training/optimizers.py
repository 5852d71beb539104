"""Optimizer + LR schedule construction.

Parity with the reference training setup (reference
``merv/training/strategies/fsdp.py:263-293``): AdamW with decay/no-decay
parameter groups (ndim<=1 and biases undecayed, ``:274-287``) and a
linear-warmup + cosine-decay schedule whose warmup is ``ratio x total_steps``
with the initial LR forced to 0 (``:290-293``).

TPU-native: built on optax; stage freezing is an ``optax.masked`` wrapper so
frozen parameters carry **no optimizer state at all** (the reference keeps
frozen params out of the optimizer by passing only trainable ones).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax

PyTree = Any


def build_schedule(
    lr_scheduler_type: str,
    learning_rate: float,
    total_steps: int,
    warmup_ratio: float = 0.03,
) -> optax.Schedule:
    if lr_scheduler_type == "linear-warmup+cosine-decay":
        warmup = max(int(total_steps * warmup_ratio), 1)
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=learning_rate, warmup_steps=warmup,
            decay_steps=max(total_steps, warmup + 1), end_value=0.0,
        )
    if lr_scheduler_type == "constant":
        return optax.constant_schedule(learning_rate)
    raise ValueError(f"Learning Rate Schedule with type `{lr_scheduler_type}` is not supported!")


def decay_mask(params: PyTree) -> PyTree:
    """Weight decay only on >=2D kernels (reference fsdp.py:274-287)."""

    def _mask(path, leaf) -> bool:
        last = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        return getattr(leaf, "ndim", 0) > 1 and last != "bias"

    return jax.tree_util.tree_map_with_path(_mask, params)


def build_optimizer(
    params: PyTree,
    schedule: optax.Schedule,
    weight_decay: float,
    max_grad_norm: float,
    trainable_mask: Optional[PyTree] = None,
) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay, mask=decay_mask(params) if weight_decay > 0 else None,
        ),
    )
    if trainable_mask is not None:
        tx = optax.masked(tx, trainable_mask)
    return tx
