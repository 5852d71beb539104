"""Autoregressive generation over the functional decoder.

Replaces the reference's HF ``GenerationMixin.generate`` path
(reference ``merv/models/vidlms/base_vidlm.py:30-108``, ``merv.py:779-830``):
prefill and decode compile to two fixed XLA programs — prefill writes the
prompt (or multimodal embedding stream) into the KV cache; decode runs a
``lax.scan`` over steps with static shapes, so the hot loop never re-traces and
the whole generation is two device executions.

Supports greedy and temperature/top-p sampling, EOS early-exit semantics
(tokens after EOS are replaced by ``pad_token_id``), and right-padded batches
(per-row prompt lengths).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from merv_tpu.models.backbones.llm.transformer import KVCache, LlamaDecoder

Array = jax.Array
PyTree = Any


@dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 128
    do_sample: bool = False
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0  # 0 = disabled
    eos_token_id: int = 2
    pad_token_id: int = 0
    # HF MinLengthLogitsProcessor semantics: EOS is banned while the total
    # sequence length (prompt + generated so far) is < min_length. The
    # reference's eval configs pass min_length=1, a no-op since prompts are
    # non-empty — preserved exactly.
    min_length: int = 1
    # "int8" stores the KV cache quantized (per-position scales) — decode
    # streams the whole cache every step, so this trims its HBM bytes ~2x;
    # None uses the decoder compute dtype
    kv_cache_dtype: Optional[str] = None


def _sample_token(logits: Array, key: Array, cfg: GenerationConfig) -> Array:
    """logits: [B, V] -> [B] int32."""
    if not cfg.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(cfg.temperature, 1e-6)
    if cfg.top_k > 0:
        k = min(cfg.top_k, logits.shape[-1])  # HF clamps top_k to vocab
        kth = jax.lax.top_k(logits, k)[0][:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p; mask the rest
        cutoff_idx = jnp.sum(cum < cfg.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def _ban_eos_below_min_length(logits: Array, cur_len: Array, cfg: GenerationConfig) -> Array:
    """logits [B, V], cur_len [B] (tokens so far incl. prompt): ban EOS while
    cur_len < min_length (HF MinLengthLogitsProcessor)."""
    if cfg.min_length <= 1:
        return logits
    is_eos = (jnp.arange(logits.shape[-1]) == cfg.eos_token_id)[None, :]
    suppress = (cur_len < cfg.min_length)[:, None]
    return jnp.where(suppress & is_eos, -jnp.inf, logits)


@partial(jax.jit, static_argnums=(0, 7, 8), donate_argnums=(3,))
def _decode_scan(
    decoder: LlamaDecoder,
    params: PyTree,
    first_token: Array,  # [B]
    cache: KVCache,
    cache_mask: Optional[Array],  # [B, max_len] bool: valid cache rows (pads False)
    start_pos: Array,  # [B] RoPE position of first_token (valid-token count per row)
    key: Array,
    cfg: GenerationConfig,
    num_steps: int,
) -> Tuple[Array, KVCache]:
    """Generate num_steps tokens after first_token.

    Returns ([B, num_steps+1] tokens, final cache). The cache is both donated
    and returned so XLA aliases the input buffers to the output (in-place
    updates, no copy); callers that don't need it just drop it.
    """

    def step(carry, key_t):
        token, cache, done, pos = carry
        logits, cache = decoder(
            params, input_ids=token[:, None], kv_cache=cache,
            attention_mask=cache_mask, positions=pos[:, None],
        )
        step_logits = logits[:, 0].astype(jnp.float32)
        # pos = per-row sequence length so far (prompt + generated)
        step_logits = _ban_eos_below_min_length(step_logits, pos + 1, cfg)
        nxt = _sample_token(step_logits, key_t, cfg)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        done = done | (nxt == cfg.eos_token_id)
        return (nxt, cache, done, pos + 1), nxt

    done0 = first_token == cfg.eos_token_id
    keys = jax.random.split(key, num_steps)
    (_, final_cache, _, _), tokens = jax.lax.scan(step, (first_token, cache, done0, start_pos), keys)
    return jnp.concatenate([first_token[:, None], tokens.T], axis=1), final_cache


def generate(
    decoder: LlamaDecoder,
    params: PyTree,
    *,
    input_ids: Optional[Array] = None,  # [B, T] right-padded
    inputs_embeds: Optional[Array] = None,  # [B, T, E] (multimodal prefill)
    attention_mask: Optional[Array] = None,  # [B, T]
    config: GenerationConfig = GenerationConfig(),
    rng: Optional[Array] = None,
    max_cache_len: Optional[int] = None,
) -> Array:
    """Returns generated token ids ``[B, max_new_tokens]`` (prompt excluded)."""
    if inputs_embeds is None:
        inputs_embeds = decoder.embed_input_ids(params, input_ids)
    B, T = inputs_embeds.shape[:2]
    rng = jax.random.PRNGKey(0) if rng is None else rng
    cache_len = max_cache_len or (T + config.max_new_tokens)
    cache_dtype = jnp.int8 if config.kv_cache_dtype == "int8" else decoder.cfg.compute_dtype
    cache = KVCache.create(decoder.cfg, B, cache_len, dtype=cache_dtype)

    # RoPE positions count only valid tokens (pads are masked from attention,
    # so their cache rows are never read — their positions are irrelevant)
    if attention_mask is not None:
        am = attention_mask.astype(jnp.int32)
        positions = jnp.maximum(jnp.cumsum(am, axis=1) - 1, 0)
        n_valid = jnp.sum(am, axis=1)
        last_idx = n_valid - 1
    else:
        positions = None
        n_valid = jnp.full((B,), T, jnp.int32)
        last_idx = jnp.full((B,), T - 1, jnp.int32)

    # prefill: lm_head projects ONLY each row's last valid position
    logits, cache = decoder(
        params, inputs_embeds=inputs_embeds, attention_mask=attention_mask,
        positions=positions, kv_cache=cache, logits_indices=last_idx,
    )
    last_logits = logits[:, 0]

    k0, k1 = jax.random.split(rng)
    first_logits = _ban_eos_below_min_length(last_logits.astype(jnp.float32), n_valid, config)
    first = _sample_token(first_logits, k0, config)

    if config.max_new_tokens == 1:
        return first[:, None]
    if attention_mask is not None:
        cache_mask = jnp.concatenate(
            [attention_mask.astype(bool), jnp.ones((B, cache_len - T), bool)], axis=1
        )
    else:
        cache_mask = None
    tokens, _ = _decode_scan(
        decoder, params, first, cache, cache_mask, n_valid, k1, config, config.max_new_tokens - 1
    )
    return tokens
