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
from typing import Any, NamedTuple, Optional, Tuple

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


def _filter_logits(logits: Array, cfg: GenerationConfig) -> Array:
    """Temperature + top-k + top-p filtering: [.., V] -> [.., V] (-inf masked).
    The categorical over the result IS the sampling distribution — speculative
    rejection sampling needs it explicitly, so it lives apart from the draw."""
    logits = logits / jnp.maximum(cfg.temperature, 1e-6)
    if cfg.top_k > 0:
        k = min(cfg.top_k, logits.shape[-1])  # HF clamps top_k to vocab
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p; mask the rest
        cutoff_idx = jnp.sum(cum < cfg.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


def _sample_token(logits: Array, key: Array, cfg: GenerationConfig) -> Array:
    """logits: [B, V] -> [B] int32."""
    if not cfg.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(key, _filter_logits(logits, cfg), axis=-1).astype(jnp.int32)


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


# ---------------------------------------------------------------------------
# Shared-prefix generation (video-prefix KV caching)
# ---------------------------------------------------------------------------


class VideoPrefix(NamedTuple):
    """A shared-video prefix cache plus the host-side facts that define which
    requests it may serve: the exact BOS ids baked into its first rows and
    the KV dtype it was built with. ``MERV.generate_batch_shared`` validates
    both before reuse — a mismatched external prefix raises instead of
    silently producing wrong generations."""

    cache: "KVCache"
    bos_ids: Tuple[int, ...]
    kv_cache_dtype: Optional[str]


def prefill_prefix(
    decoder: LlamaDecoder,
    params: PyTree,
    *,
    inputs_embeds: Array,  # [1, P, E] — the shared prefix, NO padding
    kv_cache_dtype: Optional[str] = None,
) -> KVCache:
    """Prefill a shared, pad-free prompt prefix into a fresh KV cache.

    Eval sets ask several questions per video, and the spliced
    ``[BOS | visual]`` prefix depends only on the video — so its tower
    forward + KV rows can be computed ONCE and reused by every question
    (:func:`generate_with_prefix`). Returns a B=1 cache whose buffer is
    EXACTLY P rows (``length == P``); the suffix path tiles + right-pads it
    to its working size, which keeps the prefix length recoverable from the
    static buffer shape (no host sync).
    """
    B, P = inputs_embeds.shape[:2]
    assert B == 1, f"shared prefix is per-video (B=1), got B={B}"
    cache_dtype = jnp.int8 if kv_cache_dtype == "int8" else decoder.cfg.compute_dtype
    cache = KVCache.create(decoder.cfg, 1, P, dtype=cache_dtype)
    _, cache = decoder(params, inputs_embeds=inputs_embeds, kv_cache=cache)
    return cache


def _tile_pad_cache(cache: KVCache, n: int, extra_rows: int) -> KVCache:
    """Broadcast a B=1 prefix cache to n rows and extend its buffer by
    ``extra_rows`` zero rows (physical copy: decode writes per-row).
    Shapes: [L, B, H_kv, max_len, D] — batch axis 1, position axis 3."""

    def grow(x, fill):
        if x is None:
            return None
        if n > 1:
            x = jnp.repeat(x, n, axis=1)
        if extra_rows > 0:
            pad_shape = x.shape[:3] + (extra_rows,) + x.shape[4:]
            x = jnp.concatenate([x, jnp.full(pad_shape, fill, x.dtype)], axis=3)
        return x

    return cache._replace(
        k=grow(cache.k, 0), v=grow(cache.v, 0),
        # int8 mode: pad scales with 1.0 (the neutral scale create() uses)
        k_scale=grow(cache.k_scale, 1.0), v_scale=grow(cache.v_scale, 1.0),
    )


def generate_with_prefix(
    decoder: LlamaDecoder,
    params: PyTree,
    prefix_cache: KVCache,
    *,
    suffix_ids: Array,  # [B, Ts] right-padded question tokens (post-BOS)
    suffix_mask: Array,  # [B, Ts]
    config: GenerationConfig = GenerationConfig(),
    rng: Optional[Array] = None,
) -> Array:
    """Generate continuations of a SHARED cached prefix — [B, max_new_tokens].

    The B suffix rows each attend the same prefix KV rows plus their own
    suffix causally, exactly as one full prefill of ``[prefix | suffix_b]``
    would — outputs are token-identical to :func:`generate` on the spliced
    sequence (pinned by ``test_generate_with_prefix_matches_full``). The
    prefix cache is tiled + padded into a fresh working buffer, so the
    caller's cache stays valid for further question batches on the same
    video.

    Cost: the towers + P-token prefill amortize over every question on the
    video; each question pays only its ~Ts-token suffix prefill + decode.
    The reference recomputes the full video prefill per question
    (reference ``merv/models/vidlms/merv.py:779-830``).

    Contract: every suffix row must contain at least one valid token
    (``suffix_mask.sum(axis=1) >= 1``). An all-pad row has no "last suffix
    position" to sample from; ``logits_indices`` is clamped to 0 so such a
    row reads the first suffix position deterministically instead of an
    arbitrary hidden state, but its output is garbage by construction —
    callers (``MERV.generate_batch_shared``) reject empty suffixes host-side.
    """
    B, Ts = suffix_ids.shape
    prefix_len = prefix_cache.k.shape[3]  # static: buffer is exactly the prefix
    cache = _tile_pad_cache(prefix_cache, B, Ts + config.max_new_tokens)
    max_len = prefix_len + Ts + config.max_new_tokens

    sm = suffix_mask.astype(jnp.int32)
    n_valid = jnp.sum(sm, axis=1)  # [B] valid suffix tokens
    positions = prefix_len + jnp.maximum(jnp.cumsum(sm, axis=1) - 1, 0)
    # cache-wide kv validity: prefix rows all valid; suffix pads invalid
    # forever; rows past the suffix window are future decode writes (valid,
    # same convention as generate())
    cache_mask = jnp.concatenate(
        [
            jnp.ones((B, prefix_len), bool),
            suffix_mask.astype(bool),
            jnp.ones((B, max_len - prefix_len - Ts), bool),
        ],
        axis=1,
    )

    embeds = decoder.embed_input_ids(params, suffix_ids)
    logits, cache = decoder(
        params, inputs_embeds=embeds, attention_mask=cache_mask,
        positions=positions, kv_cache=cache,
        logits_indices=jnp.maximum(n_valid - 1, 0),
    )
    last_logits = logits[:, 0].astype(jnp.float32)

    rng = jax.random.PRNGKey(0) if rng is None else rng
    k0, k1 = jax.random.split(rng)
    total_valid = prefix_len + n_valid
    first = _sample_token(_ban_eos_below_min_length(last_logits, total_valid, config), k0, config)
    if config.max_new_tokens == 1:
        return first[:, None]
    tokens, _ = _decode_scan(
        decoder, params, first, cache, cache_mask, total_valid, k1, config,
        config.max_new_tokens - 1,
    )
    return tokens


# ---------------------------------------------------------------------------
# Speculative decoding (prompt-lookup / n-gram drafting, no draft model)
# ---------------------------------------------------------------------------


def _ngram_propose(
    hist: Array,  # [Hc] int32 token history (prompt + generated), pad beyond hist_len
    hist_len: Array,  # scalar int32
    gamma: int,
    ngram: int,
    pad_id: int,
) -> Array:
    """Propose ``gamma`` draft tokens: find the most recent PREVIOUS occurrence
    of the last ``ngram`` tokens in the history and return what followed it
    (prompt-lookup decoding). No match -> pad tokens (they verify-reject at
    zero extra cost; the step is HBM-bound on weights either way).

    ``ngram`` is the LONGEST suffix tried: levels ngram, ngram-1, ..., 1
    cascade — a longer suffix match is a stronger context signal, so it wins;
    shorter levels keep proposals flowing when the long suffix is novel.

    Static-shape throughout: each level's match scan is shifted compares over
    the whole buffer — O(Hc*ngram^2) VPU elementwise work, noise next to the
    verify forward.
    """
    Hc = hist.shape[0]
    W = Hc - ngram - gamma + 1  # starts whose ngram window AND draft read stay in bounds
    idx = jnp.arange(W)
    best_start = jnp.int32(0)
    best_found = jnp.zeros((), bool)
    for n in range(ngram, 0, -1):
        key = jax.lax.dynamic_slice(hist, (hist_len - n,), (n,))
        match = jnp.ones((W,), bool)
        for j in range(n):
            match &= hist[j : W + j] == key[j]
        # strictly-previous occurrence only (the current suffix starts at hist_len-n)
        match &= idx < hist_len - n
        found = match.any()
        last = (W - 1) - jnp.argmax(match[::-1])  # most recent match wins
        take = found & ~best_found
        best_start = jnp.where(take, last + n, best_start)  # draft begins after the match
        best_found |= found
    draft = jax.lax.dynamic_slice(hist, (best_start,), (gamma,))
    return jnp.where(best_found, draft, jnp.int32(pad_id))


def _spec_accept(
    probs: Array,  # [B, gamma+1, V] target sampling distributions (post-filter softmax)
    draft: Array,  # [B, gamma] deterministic proposals
    key: Array,
    pad_id: int,
) -> Tuple[Array, Array]:
    """Rejection sampling against a DETERMINISTIC (delta) proposal
    (Leviathan et al. speculative sampling, specialized to q = delta_d):
    accept draft d_t with probability p_t(d_t); the first rejection emits a
    sample from the residual (p_t with d_t removed, renormalized); full
    acceptance emits a bonus sample from p_gamma. Every position emits
    EXACTLY from p_t marginally — sampling speculation is distributionally
    lossless (pinned by test_spec_accept_marginals).

    Returns ([B, gamma+1] tokens padded past each row's count, [B] counts).
    """
    B, G1, _ = probs.shape
    gamma = G1 - 1
    keys = jax.random.split(key, 2 * gamma + 1)
    bidx = jnp.arange(B)
    alive = jnp.ones((B,), bool)
    emit_n = jnp.zeros((B,), jnp.int32)
    out = jnp.full((B, G1), pad_id, jnp.int32)
    for t in range(gamma):
        p_t = probs[:, t]
        d_t = draft[:, t]
        p_d = p_t[bidx, d_t]
        u = jax.random.uniform(keys[2 * t], (B,))
        accept = u < p_d
        # residual: p with the draft's mass removed (q is a delta there), renorm
        resid = p_t.at[bidx, d_t].set(0.0)
        resid_tok = jax.random.categorical(
            keys[2 * t + 1], jnp.log(resid + 1e-30), axis=-1
        ).astype(jnp.int32)
        tok_t = jnp.where(accept, d_t, resid_tok)
        out = out.at[:, t].set(jnp.where(alive, tok_t, pad_id))
        emit_n = emit_n + alive.astype(jnp.int32)
        alive = alive & accept
    bonus = jax.random.categorical(
        keys[-1], jnp.log(probs[:, gamma] + 1e-30), axis=-1
    ).astype(jnp.int32)
    out = out.at[:, gamma].set(jnp.where(alive, bonus, pad_id))
    emit_n = emit_n + alive.astype(jnp.int32)
    return out, emit_n


def generate_speculative(
    decoder: LlamaDecoder,
    params: PyTree,
    *,
    input_ids: Optional[Array] = None,  # [1, T] right-padded
    inputs_embeds: Optional[Array] = None,  # [1, T, E] (multimodal prefill)
    attention_mask: Optional[Array] = None,  # [1, T]
    prompt_lookup_ids: Optional[Array] = None,  # [1, T'] right-padded text ids for the draft corpus
    lookup_mask: Optional[Array] = None,  # [1, T'] validity of prompt_lookup_ids
    config: GenerationConfig = GenerationConfig(),
    gamma: int = 4,
    ngram: int = 2,
    rng: Optional[Array] = None,
    max_cache_len: Optional[int] = None,
) -> Array:
    """Generation with prompt-lookup speculative decoding — B=1.

    Decode at full depth is AT the HBM bandwidth bound (BASELINE.md: weights
    stream at 95% of measured bandwidth), so the only lever left is tokens
    PER weight-stream: draft ``gamma`` tokens by n-gram lookup in the
    prompt+history (Saxena's prompt-lookup decoding — no draft model), then
    verify all of them in ONE ``T=gamma+1`` forward. That forward reads the
    same weight bytes as a single-token step, so every accepted draft is a
    nearly-free extra token; rejected drafts cost nothing (their cache rows
    are overwritten in order by construction — same stale-row argument as the
    serving engine's slot reuse).

    Losslessness: greedy output is token-for-token IDENTICAL to ``generate``;
    with ``do_sample`` the acceptance is Leviathan-style rejection sampling
    against the delta proposal (:func:`_spec_accept`), so every emitted token
    is marginally distributed exactly as the plain sampling path (different
    rng stream, same distribution).

    The loop is one ``lax.while_loop`` whose body is the verify forward +
    O(Hc) bookkeeping — a single compiled program, no per-step host sync.
    The reference has no speculative path (HF bs=1 ``generate``,
    reference ``merv/models/vidlms/merv.py:779-830``).
    """
    if gamma < 1:
        raise ValueError(f"gamma must be >= 1, got {gamma}")
    if inputs_embeds is None:
        inputs_embeds = decoder.embed_input_ids(params, input_ids)
    B, T = inputs_embeds.shape[:2]
    if B != 1:
        raise ValueError(f"speculative decoding supports B=1 (got B={B}); rows with "
                         "different acceptance counts desync a shared scalar cache")
    if prompt_lookup_ids is None:
        if input_ids is None:
            raise ValueError("multimodal (inputs_embeds) speculative decoding needs "
                             "prompt_lookup_ids (the text token ids) for the draft corpus")
        prompt_lookup_ids, lookup_mask = input_ids, attention_mask

    max_new = config.max_new_tokens
    pad_id, eos_id = config.pad_token_id, config.eos_token_id
    cache_len = max_cache_len or (T + max_new + gamma + 1)
    cache_dtype = jnp.int8 if config.kv_cache_dtype == "int8" else decoder.cfg.compute_dtype
    cache = KVCache.create(decoder.cfg, 1, cache_len, dtype=cache_dtype)

    # prefill — identical to generate()
    if attention_mask is not None:
        am = attention_mask.astype(jnp.int32)
        positions = jnp.maximum(jnp.cumsum(am, axis=1) - 1, 0)
        n_valid = jnp.sum(am, axis=1)
        last_idx = n_valid - 1
        cache_mask = jnp.concatenate(
            [attention_mask.astype(bool), jnp.ones((1, cache_len - T), bool)], axis=1
        )
    else:
        positions = None
        n_valid = jnp.full((1,), T, jnp.int32)
        last_idx = jnp.full((1,), T - 1, jnp.int32)
        cache_mask = None
    logits, cache = decoder(
        params, inputs_embeds=inputs_embeds, attention_mask=attention_mask,
        positions=positions, kv_cache=cache, logits_indices=last_idx,
    )
    rng = jax.random.PRNGKey(0) if rng is None else rng
    k_first, k_loop = jax.random.split(rng)
    first_logits = _ban_eos_below_min_length(logits[:, 0].astype(jnp.float32), n_valid, config)
    first = _sample_token(first_logits, k_first, config)[0]

    # draft corpus: valid prompt tokens are contiguous from 0 (right padding)
    lk = prompt_lookup_ids[0].astype(jnp.int32)
    n_lookup = (jnp.sum(lookup_mask[0].astype(jnp.int32)) if lookup_mask is not None
                else jnp.int32(lk.shape[0]))
    Hc = lk.shape[0] + max_new + 2 * gamma + ngram + 8
    hist = jnp.full((Hc,), pad_id, jnp.int32)
    hist = jax.lax.dynamic_update_slice(hist, lk, (0,))
    # pads past n_lookup are inert: matches are bounded by hist_len and the
    # first generated token overwrites nothing (appends at hist_len)
    hist = hist.at[n_lookup].set(first)
    hist_len = n_lookup + 1

    out_buf = jnp.full((max_new + gamma + 1,), pad_id, jnp.int32).at[0].set(first)
    steps_v = jnp.arange(gamma + 1, dtype=jnp.int32)
    eos_vec = (jnp.arange(decoder.cfg.vocab_size) == eos_id)[None, :]

    def cond(c):
        _, _, _, _, _, n_out, done, _, _ = c
        return (~done) & (n_out < max_new)

    def body(c):
        cache, hist, hist_len, last_tok, rope_pos, n_out, done, out_buf, key = c
        key, k_acc = jax.random.split(key)
        draft = _ngram_propose(hist, hist_len, gamma, ngram, pad_id)
        inputs = jnp.concatenate([last_tok[None], draft])[None]  # [1, gamma+1]
        pos = (rope_pos + steps_v)[None]
        old_len = cache.length
        logits, cache = decoder(
            params, input_ids=inputs, kv_cache=cache,
            attention_mask=cache_mask, positions=pos,
        )
        lg = logits[0].astype(jnp.float32)  # [gamma+1, V]
        if config.min_length > 1:
            lg = jnp.where(((rope_pos + 1 + steps_v) < config.min_length)[:, None] & eos_vec,
                           -jnp.inf, lg)
        if config.do_sample:
            probs = jax.nn.softmax(_filter_logits(lg, config), axis=-1)
            w_all, nat_emit = _spec_accept(probs[None], draft[None], k_acc, pad_id)
            w_all, nat_emit = w_all[0], nat_emit[0]
        else:
            w_all = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # [gamma+1]
            nat_emit = jnp.sum(jnp.cumprod((draft == w_all[:gamma]).astype(jnp.int32))) + 1
        is_eos = (w_all == eos_id) & (steps_v < nat_emit)
        has_eos = is_eos.any()
        emit_n = jnp.where(has_eos, jnp.argmax(is_eos) + 1, nat_emit)
        window = jnp.where(steps_v < emit_n, w_all, pad_id)
        out_buf = jax.lax.dynamic_update_slice(out_buf, window, (n_out,))
        hist = jax.lax.dynamic_update_slice(hist, window, (hist_len,))
        # roll the write pointer back to the last ACCEPTED row; stale rows
        # beyond are overwritten in order before they become readable (next
        # step writes gamma+1 rows starting exactly at the new length)
        cache = cache._replace(length=old_len + emit_n)
        last_tok = window[jnp.maximum(emit_n - 1, 0)]
        return (cache, hist, hist_len + emit_n, last_tok, rope_pos + emit_n,
                n_out + emit_n, done | has_eos, out_buf, key)

    init = (cache, hist, hist_len, first, n_valid[0], jnp.int32(1),
            first == eos_id, out_buf, k_loop)
    _, _, _, _, _, n_out, _, out_buf, _ = jax.lax.while_loop(cond, body, init)
    out = jnp.where(jnp.arange(max_new) < n_out, out_buf[:max_new], pad_id)
    return out[None]
