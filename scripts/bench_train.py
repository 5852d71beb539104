"""Align-stage training-step benchmark (BASELINE config 5).

One fully-jitted sharded optimizer step of the align stage (projectors +
fusion trainable; towers + LLM frozen — backward still flows through the LLM
activations to reach the spliced visual tokens). Reports steps/sec and
examples/sec on the local device(s).

Env: BENCH_LLM_LAYERS (default 8), BENCH_BATCH (default 2), BENCH_TEXT (64).
"""

from __future__ import annotations

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))



import json
import os

from merv_tpu.util.cache import enable_compile_cache

enable_compile_cache()
import time

import jax
import jax.numpy as jnp
import numpy as np


from merv_tpu.benchkit import build_model  # noqa: E402
from merv_tpu.models.vidlms.base_vidlm import IGNORE_INDEX  # noqa: E402
from merv_tpu.parallel import MeshConfig, batch_sharding, build_mesh  # noqa: E402
from merv_tpu.training.optimizers import build_optimizer, build_schedule  # noqa: E402
from merv_tpu.training.train_step import (  # noqa: E402
    TrainState,
    jit_train_step,
    make_loss_fn,
    make_train_step,
    shard_train_state,
)


def main() -> None:
    layers = int(os.environ.get("BENCH_LLM_LAYERS", "8"))
    B = int(os.environ.get("BENCH_BATCH", "2"))
    T = int(os.environ.get("BENCH_TEXT", "64"))
    tiny = jax.devices()[0].platform == "cpu"
    model = build_model(layers, tiny=tiny)
    model.freeze_backbones("align")

    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))

    @jax.jit
    def make_params():
        def mk(path_unused, s):
            return jnp.zeros(s.shape, jnp.bfloat16 if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype)

        tree = jax.tree_util.tree_map_with_path(mk, shapes)
        # trainables in fp32 (master weights)
        tree["projectors"] = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), tree["projectors"])
        tree["feature_fusion"] = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), tree["feature_fusion"])
        return tree

    params = make_params()
    mesh = build_mesh(MeshConfig(data=1, fsdp=-1, tensor=1))
    schedule = build_schedule("linear-warmup+cosine-decay", 1e-3, total_steps=1000)
    tx = build_optimizer(params, schedule, weight_decay=0.0, max_grad_norm=1.0,
                         trainable_mask=model.trainable_mask(params))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state, specs = shard_train_state(state, mesh, strategy="fsdp-full-shard")

    loss_fn = make_loss_fn(model, remat=True)
    step_fn = jit_train_step(
        make_train_step(loss_fn, tx, grad_accumulation_steps=1, trainable_mask=model.trainable_mask(params)),
        specs, mesh,
    )

    rng = np.random.RandomState(0)
    bshard = batch_sharding(mesh)
    put = lambda x: jax.device_put(jnp.asarray(x), bshard)  # noqa: E731
    batch = {
        "input_ids": put(rng.randint(3, 250, size=(B, T)).astype(np.int32)),
        "attention_mask": put(np.ones((B, T), np.int32)),
        "labels": put(np.where(np.arange(T)[None] > 0, rng.randint(3, 250, size=(B, T)), IGNORE_INDEX).astype(np.int32)),
        "video_values": [put(rng.randn(B, *vb.default_video_resolution).astype(np.float32)) for vb in model.video_backbones],
        "is_multimodal": put(np.ones((B,), bool)),
    }

    state, metrics = step_fn(state, batch)
    loss = float(metrics["loss"])  # force compile + completion

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch)
        float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(json.dumps({
        "metric": f"align-stage train step (llm depth {layers}/32, bsz {B})",
        "examples_per_sec": round(B / dt, 3),
        "step_sec": round(dt, 4),
        "loss": round(loss, 4),
    }))


if __name__ == "__main__":
    main()
