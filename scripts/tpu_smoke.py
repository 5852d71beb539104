"""On-chip smoke checks (run manually on a real TPU; CI runs on CPU mesh).

Checks: Pallas flash-attention forward + backward parity vs the XLA
reference, and a small merv prefill. Prints one line per check.

Note for axon-tunneled chips: ``block_until_ready`` does not synchronize
through the tunnel — every check forces completion with a scalar fetch.
"""

from __future__ import annotations

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))



import time

import jax
import jax.numpy as jnp

from merv_tpu.ops.attention import attention, attention_reference


def check_attention_forward() -> None:
    B, H, T, D = 2, 8, 1024, 128
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (B, H, T, D), jnp.bfloat16) for i in range(3))
    mask = jnp.arange(T)[None, :] < jnp.asarray([T, T - 77])[:, None]
    a = jax.jit(lambda q, k, v: attention(q, k, v, causal=True, kv_mask=mask, impl="pallas").astype(jnp.float32).sum())
    b = jax.jit(lambda q, k, v: attention_reference(q, k, v, causal=True, kv_mask=mask).astype(jnp.float32).sum())
    ra, rb = float(a(q, k, v)), float(b(q, k, v))
    rel = abs(ra - rb) / max(abs(rb), 1e-9)
    print(f"attention fwd rel err: {rel:.2e} {'OK' if rel < 1e-3 else 'FAIL'}")


def check_attention_backward() -> None:
    B, H, T, D = 2, 4, 512, 128
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (B, H, T, D), jnp.float32) for i in range(3))
    mask = jnp.arange(T)[None, :] < jnp.asarray([T, T - 100])[:, None]

    def lp(q, k, v):
        return attention(q, k, v, causal=True, kv_mask=mask, impl="pallas").astype(jnp.float32).sum()

    def lr(q, k, v):
        return attention_reference(q, k, v, causal=True, kv_mask=mask).astype(jnp.float32).sum()

    gp = jax.jit(jax.grad(lp, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(lr, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", gp, gr):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        print(f"attention d{name} rel err: {rel:.2e} {'OK' if rel < 5e-3 else 'FAIL'}")


def check_prefill_latency() -> None:
    import dataclasses

    from merv_tpu.models.backbones.llm.transformer import LLAMA2_7B, LlamaDecoder

    cfg = dataclasses.replace(LLAMA2_7B, num_layers=8, param_dtype=jnp.bfloat16)
    dec = LlamaDecoder(cfg)
    shapes = jax.eval_shape(lambda: dec.init(jax.random.PRNGKey(0)))
    params = jax.jit(
        lambda: jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16 if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype), shapes
        )
    )()
    emb = jnp.zeros((1, 1088, cfg.hidden_size), jnp.bfloat16)
    f = jax.jit(lambda p, e: dec(p, inputs_embeds=e)[0][:, -1].astype(jnp.float32).mean())
    float(f(params, emb))  # compile
    t0 = time.perf_counter()
    float(f(params, emb))
    print(f"8-layer 7B-width prefill (T=1088): {(time.perf_counter() - t0) * 1e3:.1f}ms (incl. tunnel RTT)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    check_attention_forward()
    check_attention_backward()
    check_prefill_latency()
