"""FLOPs / parameter accounting.

The reference uses calflops with a synthetic max-length input (reference
``merv/util/flops_utils.py:13-42``). TPU-native: XLA's own cost analysis of
the compiled forward program gives exact FLOPs (what actually executes,
including fusion effects) — no per-module hooks needed.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from merv_tpu.nn.core import count_params

PyTree = Any


def get_statistics(
    vidlm: Any,
    params: Optional[PyTree] = None,
    num_frames: Optional[List[int]] = None,
    seq_len: Optional[int] = None,
    batch: int = 1,
) -> Tuple[float, int]:
    """(forward GFLOPs via XLA cost analysis, total parameter count)."""
    if params is None:
        params = jax.eval_shape(lambda: vidlm.init(jax.random.PRNGKey(0)))
    n_params = int(
        sum(int(jnp.prod(jnp.asarray(x.shape))) for x in jax.tree_util.tree_leaves(params) if hasattr(x, "shape"))
    )

    T = seq_len or vidlm.llm_max_length - vidlm.visual_feature_length
    input_ids = jnp.ones((batch, T), jnp.int32)
    attention_mask = jnp.ones((batch, T), jnp.int32)
    videos = [jnp.zeros((batch, *vb.default_video_resolution), jnp.bfloat16) for vb in vidlm.video_backbones]

    def fwd(params, input_ids, attention_mask, videos):
        return vidlm.forward(params, input_ids, attention_mask, videos)["logits"]

    lowered = jax.jit(fwd).lower(params, input_ids, attention_mask, videos)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device program
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    return flops / 1e9, n_params


def params_by_module(params: PyTree) -> Dict[str, int]:
    return {k: count_params(v) for k, v in params.items()}
