"""Continuous-batching serving engine with per-slot KV-cache pointers.

The reference's serving loop (reference ``merv/models/vidlms/merv.py:779-830``
via HF ``GenerationMixin.generate``) is group-synchronous: a batch pads to its
longest prompt, decodes until EVERY row finishes, and only then admits the
next group — short answers idle their slot for as long as the longest answer
in the group runs. This engine keeps a fixed pool of decode slots live
instead:

- each slot owns one row of a shared static-shape :class:`KVCache` whose
  ``length`` is a **[B] vector** (per-slot write pointers — see
  ``transformer.py::KVCache``); sequences always occupy cache positions
  ``[0, length[b])`` of their row, so admission never re-lays-out memory;
- a new request prefills **per-request at B=1** (prompt lengths pad to static
  buckets, one compiled prefill per bucket) and its small cache splices into
  a free slot with one ``dynamic_update_slice`` (``_insert_into_slot``);
- decode runs ``steps_per_sync`` tokens for ALL slots as one jitted
  ``lax.scan`` program (``_decode_chunk``); the host syncs once per chunk to
  emit tokens, retire finished slots, and admit queued requests into the
  freed rows;
- admission is ASYNC by default: prefill, slot insert, and the next decode
  chunk are dispatched back-to-back without a device->host readback in
  between (the first sampled token resolves at the next chunk's sync), so
  the device queue never drains while the host waits on a prefill — the
  only admission cost decode still sees is the prefill's own device time
  (the true FLOPs, already minimized by batched + fused admission). This is
  the chunked-prefill-interleaving goal reached by pipelining whole
  bucketed prefills instead of splitting them: at engine bucket sizes
  prefill is weight-stream-bound, so token-chunking a prompt would only
  multiply the number of weight streams it pays.

Everything under jit has static shapes: the engine compiles exactly one
decode program plus one (prefill, insert) pair per prompt-length bucket,
regardless of how many requests it serves.

TPU-fit notes: slot writes are single-position scatters into the scan-carried
cache (in-place, a few KB — the whole-cache-copy hazard documented in
``transformer.py::_layer`` does not apply); the chunked host sync amortizes
the device->host latency of token readback over ``steps_per_sync`` steps,
which matters doubly on a remote-dispatch tunnel.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from merv_tpu.models.backbones.llm.transformer import KVCache, LlamaDecoder
from merv_tpu.models.generation import (
    GenerationConfig,
    _ban_eos_below_min_length,
    _filter_logits,
    _ngram_propose,
    _sample_token,
    _spec_accept,
)
from merv_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)

Array = jax.Array
PyTree = Any


@dataclass
class Request:
    """One generation request. Provide ``input_ids`` (already tokenized) for
    LLM-level engines, or ``prompt_text`` (+ optional ``video``) for VidLM
    engines, which tokenize and preprocess through the model's own pipeline."""

    request_id: str
    input_ids: Optional[np.ndarray] = None  # [T] int32
    prompt_text: Optional[str] = None
    video: Optional[Any] = None  # path / frame array; None = unimodal
    max_new_tokens: int = 128
    # name of a prefix registered via ``engine.register_prefix`` /
    # ``engine.register_prefix_video``: admission then prefills ONLY the
    # suffix (``input_ids`` post-BOS at LLM level; ``prompt_text`` whose BOS
    # strips against the prefix's baked-in ids at VidLM level) against the
    # shared prefix KV — towers + prefix prefill amortize across requests
    prefix_id: Optional[str] = None


@dataclass
class RequestResult:
    request_id: str
    token_ids: np.ndarray  # [max_new_tokens] int32, pad after EOS (generate() layout)
    finish_reason: str  # "eos" | "budget" | "error"
    error: Optional[str] = None  # "<ExcType>: <message>" when finish_reason == "error"


@dataclass
class EngineStats:
    prefills: int = 0
    decode_chunks: int = 0
    decode_steps: int = 0
    slot_steps_active: int = 0  # slot-steps spent on live requests
    slot_steps_idle: int = 0  # slot-steps wasted on empty/finished slots
    prefill_buckets: List[int] = field(default_factory=list)  # distinct POST-fusion program buckets
    # one entry PER admission, recording its pre-fusion (true prompt-length)
    # bucket — the distribution length_bucket tuning reads; prefill_buckets
    # only shows what fused programs compiled, not what the workload looked like
    admit_buckets: List[int] = field(default_factory=list)
    spec_steps: int = 0  # verify forwards executed for live slots (speculative mode)
    spec_emitted: int = 0  # tokens those forwards produced (>= spec_steps)
    spec_disables: int = 0  # monitor fell back to plain decode (below break-even)
    spec_reenables: int = 0  # monitor re-enabled (trailing estimate recovered)
    prefetch_hits: int = 0  # admissions whose host prep overlapped a decode chunk
    errors: int = 0  # requests that failed (corrupt media / over-budget / prep error)
    # per-request time-to-first-token: submit() -> the first sampled token
    # becoming host-visible (at placement when blocking, at the next chunk
    # sync under async admission — the honest moment a caller could see it)
    ttft_s: List[float] = field(default_factory=list)
    batched_admissions: int = 0  # admissions that shared a prefill program with others
    prefix_admissions: int = 0  # admissions served suffix-only off a shared prefix
    admit_s: float = 0.0  # host wall time inside _admit (prefill stall: decode waits)
    decode_s: float = 0.0  # host wall time inside decode chunks (incl. the sync)

    @property
    def slot_utilization(self) -> float:
        total = self.slot_steps_active + self.slot_steps_idle
        return self.slot_steps_active / total if total else 0.0

    @property
    def prefill_stall_share(self) -> float:
        """Fraction of serving wall time the host spent inside admission
        (host prep the prefetcher didn't hide, dispatch, and — with
        ``async_admission=False`` — the blocking prefill readback). Under
        async admission the prefill readback pipelines into the next chunk
        sync, so this measures only the residual host-side admission work;
        the prefill's device time (true FLOPs, already minimized by batched
        + fused admission) then lands in ``decode_s``."""
        total = self.admit_s + self.decode_s
        return self.admit_s / total if total else 0.0

    @property
    def tokens_per_step(self) -> float:
        """Mean tokens per HBM-bound verify step (speculative speedup proxy)."""
        return self.spec_emitted / self.spec_steps if self.spec_steps else 1.0


@dataclass
class _Slot:
    request: Optional[Request] = None
    emitted: List[int] = field(default_factory=list)
    done: bool = True  # no occupant
    # host-side draft corpus mirror (prompt ids), kept whenever the engine is
    # speculation-capable so the monitor can (a) estimate n-gram acceptance
    # from the plain-decode stream while speculation is disabled and
    # (b) rebuild the device hist buffers on re-enable
    prompt_ids: Optional[List[int]] = None
    est_pos: int = 0  # next history index the acceptance estimator consumes
    # async admission: (device first-token array [n], row) whose host value
    # has not been read yet — resolved at the next chunk sync, so the
    # admission never blocks the dispatch pipeline on a device->host readback
    pending_first: Optional[Tuple[Array, int]] = None


# Measured verify-step cost relative to a plain decode step (chip, full-depth
# int8 llama-7B, v5e — BASELINE.md "Speculative decoding characterized":
# plain 9.915 ms; gamma=2 12.517 ms; gamma=4 12.982 ms; gamma=8 13.557 ms).
# The verify program is static so the ratio is acceptance-independent; the
# monitor uses it to pick gamma = argmax est_tokens_per_step(g) / cost(g).
_SPEC_COST_RATIO = {2: 1.262, 4: 1.309, 8: 1.367}


def _spec_cost_ratio(gamma: int) -> float:
    """Interpolate/extrapolate the measured verify-cost table for other gammas."""
    if gamma in _SPEC_COST_RATIO:
        return _SPEC_COST_RATIO[gamma]
    xs = sorted(_SPEC_COST_RATIO)
    if gamma <= xs[0]:
        return _SPEC_COST_RATIO[xs[0]]
    for lo, hi in zip(xs, xs[1:]):
        if gamma <= hi:
            f = (gamma - lo) / (hi - lo)
            return _SPEC_COST_RATIO[lo] + f * (_SPEC_COST_RATIO[hi] - _SPEC_COST_RATIO[lo])
    # beyond the table: extend the last measured slope
    slope = (_SPEC_COST_RATIO[xs[-1]] - _SPEC_COST_RATIO[xs[-2]]) / (xs[-1] - xs[-2])
    return _SPEC_COST_RATIO[xs[-1]] + slope * (gamma - xs[-1])


def _ngram_propose_host(h: List[int], gamma: int, ngram: int, pad_id: int) -> List[int]:
    """Host mirror of :func:`merv_tpu.models.generation._ngram_propose` (same
    cascade: the most recent strictly-previous occurrence of the LONGEST
    matching suffix wins; what followed it is the draft). Used only by the
    acceptance estimator — never on the decode path."""
    L = len(h)
    for n in range(min(ngram, L - 1), 0, -1):
        key = h[L - n :]
        for s in range(L - n - 1, -1, -1):
            if h[s : s + n] == key:
                d = h[s + n : s + n + gamma]
                return d + [pad_id] * (gamma - len(d))
    return [pad_id] * gamma


def _sim_spec_steps(
    h: List[int], start: int, gamma: int, ngram: int, pad_id: int
) -> Tuple[int, int]:
    """Simulate prompt-lookup speculation over an ALREADY-emitted greedy
    stream: at each virtual verify step the drafter sees ``h[:i]`` and the
    actual continuation ``h[i:]`` decides acceptance. Greedy acceptance is
    exact-match, so the plain-decode stream IS the counterfactual speculative
    stream — this estimate is unbiased and costs zero device time. Returns
    (virtual verify steps, tokens those steps would have emitted)."""
    steps = emitted = 0
    i = max(start, ngram + 1)
    L = len(h)
    while i < L:
        draft = _ngram_propose_host(h[:i], gamma, ngram, pad_id)
        k = 0
        while k < gamma and i + k < L and draft[k] == h[i + k]:
            k += 1
        steps += 1
        emitted += min(k + 1, L - i)
        i += k + 1
    return steps, emitted


@partial(jax.jit, donate_argnums=(0, 1))
def _insert_into_slot(
    cache: KVCache,
    last_tok: Array,  # [B]
    small: Tuple[Array, Array, Optional[Array], Optional[Array]],  # [L,n,H,Tb,D] (+scales)
    row: Array,  # scalar int32: which row of the (possibly batched) small cache
    slot: Array,  # scalar int32
    n_valid: Array,  # scalar int32
    first_tok: Array,  # scalar int32
) -> Tuple[KVCache, Array]:
    """Splice row ``row`` of a freshly prefilled request cache into slot row
    ``slot`` of the shared cache: copy its Tb cache rows to offset 0 and reset
    the slot's pointer. ``small`` may hold several requests prefilled together
    (batched admission) — each call splices one row. Stale rows past
    ``n_valid`` from the previous occupant stay in HBM but are dead — per-slot
    kv masks never read past ``length[b]`` and decode overwrites them in
    order."""
    sk, sv, sks, svs = small

    def put(buf, val):
        val = jax.lax.dynamic_slice_in_dim(val, row, 1, axis=1)
        return jax.lax.dynamic_update_slice(buf, val, (0, slot, 0, 0, 0))

    k, v = put(cache.k, sk.astype(cache.k.dtype)), put(cache.v, sv.astype(cache.v.dtype))
    ks = put(cache.k_scale, sks) if cache.k_scale is not None else None
    vs = put(cache.v_scale, svs) if cache.v_scale is not None else None
    length = cache.length.at[slot].set(n_valid)
    last_tok = last_tok.at[slot].set(first_tok)
    return KVCache(k, v, length, ks, vs), last_tok


@partial(jax.jit, static_argnums=(0, 5, 6), donate_argnums=(2,))
def _decode_chunk(
    decoder: LlamaDecoder,
    params: PyTree,
    cache: KVCache,  # length: [B] per-slot pointers
    last_tok: Array,  # [B] int32
    done: Array,  # [B] bool
    cfg: GenerationConfig,
    num_steps: int,
    rng: Array,
) -> Tuple[Array, KVCache, Array, Array]:
    """Advance every slot ``num_steps`` tokens in one program.

    Finished/empty slots (``done``) still flow through the batched matmuls
    (static shapes — that's the price of one compiled program) but their
    pointers freeze, they emit ``pad_token_id``, and their cache row only
    self-overwrites one masked-in position. Returns ([num_steps, B] tokens,
    cache, last token, done)."""

    def step(carry, key_t):
        cache, tok, done = carry
        logits, cache2 = decoder(params, input_ids=tok[:, None], kv_cache=cache)
        lg = logits[:, 0].astype(jnp.float32)
        lg = _ban_eos_below_min_length(lg, cache.length + 1, cfg)
        nxt = _sample_token(lg, key_t, cfg)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        new_done = done | (nxt == cfg.eos_token_id)
        # freeze finished slots' pointers so they never walk off their row
        cache2 = cache2._replace(length=jnp.where(done, cache.length, cache2.length))
        return (cache2, nxt, new_done), nxt

    keys = jax.random.split(rng, num_steps)
    (cache, tok, done), toks = jax.lax.scan(step, (cache, last_tok, done), keys)
    return toks, cache, tok, done


@partial(jax.jit, static_argnums=(0, 5, 6, 7, 8), donate_argnums=(2, 9, 10))
def _decode_chunk_spec(
    decoder: LlamaDecoder,
    params: PyTree,
    cache: KVCache,  # length: [B] per-slot pointers; buffer has gamma+1 spare rows
    last_tok: Array,  # [B] int32
    done: Array,  # [B] bool
    cfg: GenerationConfig,
    num_steps: int,
    gamma: int,
    ngram: int,
    hist: Array,  # [B, Hc] per-slot token history (draft corpus)
    hist_len: Array,  # [B] int32
    rng: Array,
) -> Tuple[Array, Array, KVCache, Array, Array, Array, Array]:
    """Batched speculative decode: every step drafts ``gamma`` tokens PER SLOT
    from that slot's own history (vmapped n-gram cascade) and verifies all
    slots' drafts in ONE ``[B, gamma+1]`` forward — the HBM-bound weight
    stream is paid once for up to ``gamma+1`` tokens per slot. Per-slot
    acceptance rolls each row's write pointer back independently (the
    per-slot multi-token cache path, ``transformer.py::_layer``). Greedy
    acceptance is exact-match; sampling acceptance is rejection sampling
    (:func:`merv_tpu.models.generation._spec_accept`, distributionally
    lossless).

    Returns ([num_steps, B, gamma+1] token windows, [num_steps, B] emit
    counts, cache, last token, done, hist, hist_len).
    """
    steps_v = jnp.arange(gamma + 1, dtype=jnp.int32)
    max_rows = cache.k.shape[3]

    def step(carry, key_t):
        cache, tok, done, hist, hist_len = carry
        draft = jax.vmap(
            lambda h, hl: _ngram_propose(h, hl, gamma, ngram, cfg.pad_token_id)
        )(hist, hist_len)  # [B, gamma]
        inputs = jnp.concatenate([tok[:, None], draft], axis=1)  # [B, gamma+1]
        old_len = cache.length
        logits, cache2 = decoder(params, input_ids=inputs, kv_cache=cache)
        B, _, V = logits.shape
        lg = logits.astype(jnp.float32).reshape(B * (gamma + 1), V)
        cur_len = (old_len[:, None] + 1 + steps_v[None]).reshape(-1)
        lg = _ban_eos_below_min_length(lg, cur_len, cfg).reshape(B, gamma + 1, V)
        if cfg.do_sample:
            probs = jax.nn.softmax(_filter_logits(lg, cfg), axis=-1)
            y, emit_n = _spec_accept(probs, draft, key_t, cfg.pad_token_id)
        else:
            y = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # [B, gamma+1]
            acc = jnp.sum(
                jnp.cumprod((draft == y[:, :gamma]).astype(jnp.int32), axis=1), axis=1
            )  # [B] leading accepted drafts
            emit_n = acc + 1
        emitted = steps_v[None] < emit_n[:, None]
        is_eos = (y == cfg.eos_token_id) & emitted
        has_eos = is_eos.any(axis=1)
        emit_n = jnp.where(has_eos, jnp.argmax(is_eos, axis=1) + 1, emit_n)
        # frozen slots: finished, or pointer about to walk off the buffer (the
        # host retires over-budget slots at the next sync; admission bounds
        # prompt+budget <= max_len so freezing implies budget already served)
        frozen = done | (old_len + gamma + 1 > max_rows)
        emit_n = jnp.where(frozen, 0, emit_n)
        window = jnp.where(steps_v[None] < emit_n[:, None], y, cfg.pad_token_id)
        cache2 = cache2._replace(length=jnp.where(frozen, old_len, old_len + emit_n))
        nxt = jnp.take_along_axis(window, jnp.maximum(emit_n - 1, 0)[:, None], axis=1)[:, 0]
        nxt = jnp.where(frozen, tok, nxt)
        new_done = done | (~frozen & has_eos)
        hist = jax.vmap(
            lambda h, w, hl: jax.lax.dynamic_update_slice(h, w, (hl,))
        )(hist, window, hist_len)
        hist_len = hist_len + emit_n
        return (cache2, nxt, new_done, hist, hist_len), (window, emit_n)

    keys = jax.random.split(rng, num_steps)
    (cache, tok, done, hist, hist_len), (wins, emits) = jax.lax.scan(
        step, (cache, last_tok, done, hist, hist_len), keys
    )
    return wins, emits, cache, tok, done, hist, hist_len


def _prefix_suffix_prefill(
    decoder: LlamaDecoder,
    params: PyTree,
    cfg: GenerationConfig,
    prefix_kv: KVCache,  # B=1 shared prefix, buffer EXACTLY P rows, length==P
    suffix_ids: Array,  # [n, Tb] right-padded post-prefix prompt tokens
    suffix_mask: Array,  # [n, Tb]
    rng: Array,
) -> Tuple[Tuple[Array, Array, Optional[Array], Optional[Array]], Array, Array]:
    """Suffix-only prefill against a SHARED prefix cache -> a splice-able
    [L, n, H, P+Tb, D] small cache whose rows each hold [prefix | suffix_b].

    The engine's prefix-caching admission path: a request that names a
    registered prefix (the ``[BOS | visual]`` KV of a video, built once by
    ``MERV.build_video_prefix``) pays only its question suffix here — the
    towers and the P-token prefix prefill amortize over every request on the
    same video. The reference recomputes the full video prefill per question
    (reference ``merv/models/vidlms/merv.py:779-830``); its eval sets ask
    several questions per video, so this is the serving fast path for the
    reference's own headline workload.

    Mirrors :func:`merv_tpu.models.generation.generate_with_prefix`'s prefill
    half exactly (positions offset by P, cache-wide kv mask, last-valid
    gather); several same-(prefix, bucket) admissions prefill together (the
    prefix tiles to n rows inside the program — one weight HBM stream for all
    of them). Returns (small cache buffers, first token [n], TOTAL valid
    rows [n] = P + suffix lengths)."""
    from merv_tpu.models.generation import _tile_pad_cache

    n, Tb = suffix_ids.shape
    P = prefix_kv.k.shape[3]
    cache = _tile_pad_cache(prefix_kv, n, Tb)
    am = suffix_mask.astype(jnp.int32)
    positions = P + jnp.maximum(jnp.cumsum(am, axis=1) - 1, 0)
    n_valid = jnp.sum(am, axis=1)
    cache_mask = jnp.concatenate(
        [jnp.ones((n, P), bool), suffix_mask.astype(bool)], axis=1
    )
    logits, cache = decoder(
        params, input_ids=suffix_ids, attention_mask=cache_mask,
        positions=positions, kv_cache=cache, logits_indices=jnp.maximum(n_valid - 1, 0),
    )
    first_logits = _ban_eos_below_min_length(
        logits[:, 0].astype(jnp.float32), P + n_valid, cfg
    )
    first = _sample_token(first_logits, rng, cfg)
    return (cache.k, cache.v, cache.k_scale, cache.v_scale), first, P + n_valid


def _llm_prefill(
    decoder: LlamaDecoder,
    params: PyTree,
    cfg: GenerationConfig,
    input_ids: Array,  # [n, Tb] right-padded (n=1 solo, n>1 batched admission)
    attention_mask: Array,  # [n, Tb]
    rng: Array,
) -> Tuple[Tuple[Array, Array, Optional[Array], Optional[Array]], Array, Array]:
    """Prompt prefill -> (small cache buffers [L,n,H,Tb,D], first token [n],
    n_valid [n]). Mirrors generation.generate()'s prefill exactly (positions
    from the mask cumsum, last-valid lm_head gather, min-length EOS ban).
    Several pending admissions sharing a length bucket prefill together: the
    weight HBM stream is paid once for all of them."""
    n, Tb = input_ids.shape
    cache_dtype = jnp.int8 if cfg.kv_cache_dtype == "int8" else decoder.cfg.compute_dtype
    cache = KVCache.create(decoder.cfg, n, Tb, dtype=cache_dtype)
    am = attention_mask.astype(jnp.int32)
    positions = jnp.maximum(jnp.cumsum(am, axis=1) - 1, 0)
    n_valid = jnp.sum(am, axis=1)
    logits, cache = decoder(
        params, input_ids=input_ids, attention_mask=attention_mask,
        positions=positions, kv_cache=cache, logits_indices=n_valid - 1,
    )
    first_logits = _ban_eos_below_min_length(logits[:, 0].astype(jnp.float32), n_valid, cfg)
    first = _sample_token(first_logits, rng, cfg)
    return (cache.k, cache.v, cache.k_scale, cache.v_scale), first, n_valid


class ContinuousBatchingEngine:
    """Slot-based continuous batching over a :class:`LlamaDecoder` (or a full
    MERV VidLM via :meth:`for_vidlm`). Submit requests, then :meth:`run`.

    The engine is generation-config-homogeneous (one sampling config, one
    compiled decode program); per-request knobs are prompt, media, and
    ``max_new_tokens``. ``max_len`` bounds prompt+output per slot — admission
    rejects requests that cannot fit.

    ``speculative_gamma > 0`` turns every decode step into a batched
    prompt-lookup speculative verify: each slot drafts gamma tokens from its
    OWN history and one ``[B, gamma+1]`` forward verifies all of them —
    per-slot acceptance advances per-slot cache pointers independently, so
    one slot's cold streak never stalls another's hot one
    (``stats.tokens_per_step`` reports the realized speedup). Greedy
    acceptance is exact-match; sampling uses rejection acceptance
    (distributionally lossless).

    Host-side request preparation (video decode + tokenization) for the head
    of the queue overlaps the decode chunk the device is already running
    (``_start_prefetch``) — admission then only pays the device prefill.

    **Prefix caching** (:meth:`register_prefix` / ``register_prefix_video``):
    requests naming a registered shared prefix (the ``[BOS | visual]`` KV of
    a video) admit suffix-only — the measured 1.71x tok/s at the LLM level
    (BASELINE.md), plus the amortized towers at VidLM level.
    """

    def __init__(
        self,
        decoder: LlamaDecoder,
        llm_params: PyTree,
        *,
        slots: int = 4,
        max_len: int = 1024,
        steps_per_sync: int = 8,
        config: GenerationConfig = GenerationConfig(),
        length_bucket: int = 64,
        prefill_fn: Optional[Callable[[Request], Tuple]] = None,
        rng: Optional[Array] = None,
        speculative_gamma: int = 0,
        speculative_ngram: int = 2,
        speculative_break_even: float = 1.2,
        speculative_autodisable: bool = True,
        batch_admissions: bool = True,
        fuse_admission_buckets: bool = True,
        fuse_max_bucket: int = 256,
        fuse_max_ratio: int = 4,
        async_admission: bool = True,
        mesh: Optional[Any] = None,
        result_callback: Optional[Callable[[RequestResult], None]] = None,
    ) -> None:
        if config.kv_cache_dtype not in (None, "int8"):
            raise ValueError(f"unsupported kv_cache_dtype {config.kv_cache_dtype!r}")
        self.decoder = decoder
        self.llm_params = llm_params
        self.num_slots = slots
        self.max_len = max_len
        self.steps_per_sync = steps_per_sync
        self.config = config
        self.length_bucket = length_bucket
        self.spec_gamma = speculative_gamma
        self.spec_ngram = speculative_ngram
        # realized tokens/step below this is a net loss (the gamma+1 verify
        # step costs ~breakeven x a plain decode step — measured on-chip, see
        # BASELINE.md "Speculative decoding acceptance curve"). With
        # autodisable=True (default) the monitor is TWO-WAY: a trailing
        # window of realized tokens/verify-step below break-even disables
        # speculation (plain decode compiles on the next chunk), and while
        # disabled a zero-device-cost host simulation of the n-gram drafter
        # over the plain-decode stream estimates acceptance — when the
        # trailing estimate clears break-even (x a hysteresis margin) the
        # engine re-enables, picking gamma from the measured per-gamma
        # verify-cost curve (_SPEC_COST_RATIO). Greedy speculation is
        # exact-match so transitions never change emitted tokens.
        self.spec_break_even = speculative_break_even
        self.spec_autodisable = speculative_autodisable
        self._spec_probe_steps = 128
        self._spec_warned = False
        self._spec_capable = speculative_gamma > 0
        self._spec_gamma0 = speculative_gamma
        self._spec_off_by_monitor = False
        self._spec_reenable_margin = 1.1
        self._spec_win_steps = 0  # trailing window while speculating (real verify steps)
        self._spec_win_emitted = 0
        self._est_win_steps = 0  # trailing window while monitor-disabled (simulated)
        self._est_win_emitted = 0
        if prefill_fn is not None:
            import inspect

            if len(inspect.signature(prefill_fn).parameters) == 1:
                # legacy single-arg prefill fns: no prepared-payload support
                self._prefill_request = lambda req, prepared=None: prefill_fn(req)
            else:
                self._prefill_request = prefill_fn
        else:
            self._prefill_request = self._default_prefill
        # batched admission: only the default LLM prefill path knows how to
        # fuse several same-bucket prompts into one prefill program; custom
        # prefill fns stay per-request. batch_admissions=False forces the
        # per-request path (the A/B knob bench_serving's churn phase uses).
        self._can_batch_prefill = prefill_fn is None and batch_admissions
        # cross-bucket fusion: short-prompt prefill is weight-stream-bound
        # (the measured churn regime), so padding every pending admission to
        # a shared bucket is nearly free — ONE prefill program per fused
        # group instead of one per distinct bucket. Fusion is GATED: a
        # bucket only joins a group while the fused (max) length stays below
        # ``fuse_max_bucket`` tokens — the weight-stream/compute crossover,
        # T* ≈ peak_flops/HBM_bw ≈ 197e12/819e9 ≈ 240 on v5e, past which the
        # pad FLOPs are no longer free — AND the pad spread stays bounded
        # (``group_max <= fuse_max_ratio * group_min``), so a near-max_len
        # prompt never drags short prompts into its compute-bound prefill.
        # Ungated fusion also allocated the fused small cache at
        # [L, n_prog, H, Tb_max, D] — a transient HBM spike the gate bounds.
        self._fuse_buckets = fuse_admission_buckets
        self._fuse_max_bucket = fuse_max_bucket
        self._fuse_max_ratio = fuse_max_ratio
        # async admission (prefill/decode pipelining): placement dispatches
        # prefill + insert and returns WITHOUT reading the first sampled
        # token back — the next decode chunk is dispatched immediately behind
        # them, so the device queue never drains while the host waits on a
        # prefill readback (each blocking readback costs device idle ~ the
        # prefill + a host round-trip; on a remote-dispatch tunnel the RTT
        # alone is ~27 ms/admission event). The first token resolves at the
        # next chunk sync (one batched readback). Requires a host-side
        # sequence-length bound for the pre-prefill budget check, so custom
        # prefill fns without a ``prepared_len`` hook fall back to blocking
        # placement. Token streams are bit-identical either way.
        self._async_admission = async_admission
        # host-side preparation hook (video decode / tokenization) that the
        # prefetcher runs while the device decodes a chunk. Custom prefill_fns
        # start with prefetch disabled — a frontend that supports it assigns
        # its own prepare (see for_vidlm); payload formats are prefill-fn-local
        self._prepare: Optional[Callable[[Request], Any]] = (
            self._prepare_llm if prefill_fn is None else None
        )
        # host-side expected sequence length of a prepared payload — lets
        # admission reject over-budget requests BEFORE paying the device
        # prefill. None (custom prefill fns) falls back to the post-prefill
        # backstop check.
        self._prepared_len: Optional[Callable[[Request, Any], int]] = (
            (lambda req, prepared: len(prepared[2])) if prefill_fn is None else None
        )
        self._prefetched: Optional[Tuple[str, Any, Dict[str, Any]]] = None
        self._submit_t: Dict[str, float] = {}  # request_id -> submit() wall time (TTFT)
        # shared-prefix registry: prefix_id -> (B=1 KVCache of exactly P rows,
        # P, bos ids baked into the cache). Requests naming a prefix_id prefill
        # suffix-only (_prefix_suffix_prefill) — the engine's prefix-caching
        # fast path for the many-questions-per-video regime.
        self._prefixes: Dict[str, Tuple[KVCache, int, Tuple[int, ...]]] = {}
        # VidLM frontends assign a prompt_text -> post-BOS suffix ids hook
        # (validates the prompt's BOS against the prefix's baked-in ids);
        # LLM-level engines take pre-stripped input_ids directly
        self._suffix_tokenize: Optional[Callable[[Request, Tuple[int, ...]], np.ndarray]] = None
        # one jit wrapper for the engine's lifetime: its compilation cache is
        # per-wrapper, so re-wrapping per request would retrace every prefill
        self._jit_prefill = jax.jit(_llm_prefill, static_argnums=(0, 2))
        self._jit_prefix_prefill = jax.jit(_prefix_suffix_prefill, static_argnums=(0, 2))
        self._rng = jax.random.PRNGKey(0) if rng is None else rng

        cache_dtype = jnp.int8 if config.kv_cache_dtype == "int8" else decoder.cfg.compute_dtype
        # gamma+1 spare rows: a live slot's pointer may advance up to gamma+1
        # past its last in-budget token before the host syncs; the freeze
        # guard in _decode_chunk_spec only fires past max_len. Size the spare
        # for the LARGEST gamma the two-way monitor may re-pick (candidates
        # top out at 8) — a smaller spare would freeze near-full slots
        # forever after an upward gamma re-pick.
        spare_gamma = max(speculative_gamma, 8) if speculative_gamma else 0
        rows = max_len + (spare_gamma + 1 if spare_gamma else 0)
        if mesh is not None and decoder.cfg.sequence_parallel:
            from merv_tpu.parallel.mesh import SEQ_AXIS as _SP

            sp_ = dict(mesh.shape).get(_SP, 1)
            if sp_ > 1:
                # sp-sharded slot cache: the rows dim must tile the sp axis
                # (extra spare rows are inert — the freeze guard only tightens)
                rows = -(-rows // sp_) * sp_
        cache = KVCache.create(decoder.cfg, slots, rows, dtype=cache_dtype)
        cache_gb = sum(b.size * b.dtype.itemsize for b in (cache.k, cache.v)) / 1e9
        overwatch.info(
            f"engine KV cache: {slots} slots x {rows} rows = {cache_gb:.2f} GB HBM "
            f"({jnp.dtype(cache_dtype).name})"
            + ("" if cache_gb < 6 else " — consider kv_cache_dtype='int8', fewer "
               "slots, or a smaller max_len beside full-depth weights")
        )
        self._cache = cache._replace(length=jnp.zeros((slots,), jnp.int32))
        self._last_tok = jnp.full((slots,), config.pad_token_id, jnp.int32)
        if speculative_gamma:
            hc = max_len + 2 * speculative_gamma + speculative_ngram + 8
            self._hist = jnp.full((slots, hc), config.pad_token_id, jnp.int32)
            self._hist_len = jnp.zeros((slots,), jnp.int32)
        self._mesh = mesh
        if mesh is not None:
            # tensor-parallel serving: params carry Megatron head splits
            # (load_vid(mesh=...)), so the cache's kv-head dim shards the same
            # way — decode attention then never re-gathers heads. Sequence-
            # parallel serving (decoder.cfg.sequence_parallel + an sp>1 mesh):
            # the cache's ROWS dim shards over sp instead — per-slot pointers
            # stay replicated, and decode attention merges per-chip partials
            # via the cross-chip online softmax (sharded_cache_attention).
            # Everything else (pointers, tokens, history) replicates.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from merv_tpu.parallel.mesh import SEQ_AXIS, TENSOR_AXIS

            tp = dict(mesh.shape).get(TENSOR_AXIS, 1)
            sp = dict(mesh.shape).get(SEQ_AXIS, 1)
            head_axis = TENSOR_AXIS if tp > 1 and decoder.cfg.num_kv_heads % tp == 0 else None
            row_axis = (
                SEQ_AXIS
                if sp > 1 and decoder.cfg.sequence_parallel and rows % sp == 0
                else None
            )
            heads = (
                P(None, None, head_axis, row_axis, None)
                if head_axis or row_axis
                else P()
            )
            hshard = NamedSharding(mesh, heads)
            repl = NamedSharding(mesh, P())

            def place(x, s):
                return None if x is None else jax.device_put(x, s)

            self._cache = KVCache(
                place(self._cache.k, hshard), place(self._cache.v, hshard),
                place(self._cache.length, repl),
                place(self._cache.k_scale, hshard), place(self._cache.v_scale, hshard),
            )
            self._last_tok = jax.device_put(self._last_tok, repl)
            if speculative_gamma:
                self._hist = jax.device_put(self._hist, repl)
                self._hist_len = jax.device_put(self._hist_len, repl)
        self._slots = [_Slot() for _ in range(slots)]
        self._queue: deque[Request] = deque()
        self._results: Dict[str, RequestResult] = {}
        # fires the moment a request finishes (incl. errors) — lets frontends
        # persist results incrementally so a crash mid-run loses at most the
        # in-flight slots (serve.py's resume protocol rides on this)
        self._result_callback = result_callback
        self.stats = EngineStats()

    # ------------------------------------------------------------------ api
    @property
    def ttft_p50(self) -> float:
        """Median time-to-first-token over finished requests (seconds)."""
        if not self.stats.ttft_s:
            return 0.0
        return float(np.median(self.stats.ttft_s))

    def submit(self, request: Request) -> None:
        self._submit_t[request.request_id] = time.perf_counter()
        self._queue.append(request)

    def register_prefix(self, prefix_id: str, prefix: Any) -> None:
        """Register a shared prompt prefix for suffix-only admission.

        ``prefix`` is a :class:`~merv_tpu.models.generation.VideoPrefix` (from
        ``MERV.build_video_prefix`` — carries the BOS ids and KV dtype it was
        built with, both validated here) or a bare B=1 :class:`KVCache` whose
        buffer is exactly the prefix rows (``prefill_prefix``'s contract).
        Requests naming ``prefix_id`` then prefill only their suffix against
        this cache (one weight stream for the suffix bucket instead of towers
        + the full P-token prefill) and splice ``[prefix | suffix]`` into
        their slot. The registered cache is read-only to the engine — one
        registration serves any number of requests and engines."""
        from merv_tpu.models.generation import VideoPrefix

        bos: Tuple[int, ...] = ()
        if isinstance(prefix, VideoPrefix):
            want = self.config.kv_cache_dtype
            if prefix.kv_cache_dtype != want:
                raise ValueError(
                    f"prefix {prefix_id!r} was built with kv_cache_dtype="
                    f"{prefix.kv_cache_dtype!r} but this engine serves {want!r}"
                )
            bos, prefix = prefix.bos_ids, prefix.cache
        want_dtype = jnp.int8 if self.config.kv_cache_dtype == "int8" else self.decoder.cfg.compute_dtype
        if prefix.k.dtype != want_dtype:
            raise ValueError(
                f"prefix {prefix_id!r} cache dtype {prefix.k.dtype} does not match "
                f"the engine's KV dtype {jnp.dtype(want_dtype).name}"
            )
        if prefix.k.shape[1] != 1:
            raise ValueError(f"prefix caches are per-video (B=1), got B={prefix.k.shape[1]}")
        P = prefix.k.shape[3]
        if P + 1 + 1 > self.max_len:
            raise ValueError(
                f"prefix {prefix_id!r} is {P} rows — no room for a suffix token "
                f"plus one generated token under max_len {self.max_len}"
            )
        if self._mesh is not None:
            # place the prefix like the slot cache's kv buffers (head-dim
            # sharded under tp; rows replicate — a P-row prefix need not tile
            # the sp axis, the splice target's GSPMD handles the copy)
            from jax.sharding import NamedSharding, PartitionSpec as P_

            from merv_tpu.parallel.mesh import TENSOR_AXIS

            tp = dict(self._mesh.shape).get(TENSOR_AXIS, 1)
            head_axis = (
                TENSOR_AXIS
                if tp > 1 and self.decoder.cfg.num_kv_heads % tp == 0
                else None
            )
            hshard = NamedSharding(self._mesh, P_(None, None, head_axis, None, None))
            repl = NamedSharding(self._mesh, P_())

            def place(x, sh):
                return None if x is None else jax.device_put(x, sh)

            prefix = KVCache(
                place(prefix.k, hshard), place(prefix.v, hshard),
                place(prefix.length, repl),
                place(prefix.k_scale, hshard), place(prefix.v_scale, hshard),
            )
        gb = sum(
            b.size * b.dtype.itemsize for b in (prefix.k, prefix.v)
        ) / 1e9
        self._prefixes[prefix_id] = (prefix, P, bos)
        overwatch.info(
            f"registered prefix {prefix_id!r}: {P} rows = {gb:.2f} GB HBM "
            f"({len(self._prefixes)} prefixes live — unregister_prefix frees them)"
        )

    def unregister_prefix(self, prefix_id: str) -> None:
        """Free a registered prefix's HBM (its requests must all be retired —
        live slots hold spliced COPIES, so in-flight decodes are unaffected,
        but new requests naming it will fail per-request). Serving drivers
        with many videos register/unregister in waves to bound HBM
        (``scripts/serve.py --prefix_budget``)."""
        self._prefixes.pop(prefix_id, None)

    def run(self, requests: Sequence[Request] = ()) -> Dict[str, RequestResult]:
        """Serve all queued (+ given) requests to completion; returns results
        keyed by request_id. Callable repeatedly — state persists."""
        for r in requests:
            self.submit(r)
        with self._mesh_scope():
            t0 = time.perf_counter()
            self._admit()
            self.stats.admit_s += time.perf_counter() - t0
            while any(s.request is not None for s in self._slots):
                t0 = time.perf_counter()
                self._decode_one_chunk()
                t1 = time.perf_counter()
                self._admit()
                t2 = time.perf_counter()
                self.stats.decode_s += t1 - t0
                self.stats.admit_s += t2 - t1
        return dict(self._results)

    def _mesh_scope(self):
        """Trace-time activation-mesh scope for mesh-aware serving modes: the
        decoder's sp-sharded-cache path (``_sp_serve_mesh``) discovers the
        mesh through ``get_activation_mesh()`` when the engine's programs
        trace; TP-only engines work purely through sharded params/cache, for
        which the scope is inert."""
        if self._mesh is None:
            from contextlib import nullcontext

            return nullcontext()
        from merv_tpu.parallel.sharding import activation_mesh

        return activation_mesh(self._mesh)

    # ------------------------------------------------------------ internals
    def _next_key(self) -> Array:
        self._rng, k = jax.random.split(self._rng)
        return k

    def _bucket(self, n: int) -> int:
        b = self.length_bucket
        return min(-(-n // b) * b, self.max_len) if b > 1 else n

    def _prepare_llm(self, req: Request):
        """Host-side request prep (pad/bucket) — prefetchable during decode."""
        if req.input_ids is None:
            raise ValueError("LLM-level engine requests need input_ids (tokenized prompt)")
        ids = np.asarray(req.input_ids, np.int32).reshape(-1)
        Tb = self._bucket(len(ids))
        if len(ids) > Tb:
            raise ValueError(f"prompt ({len(ids)} tokens) exceeds max_len {self.max_len}")
        padded = np.full((1, Tb), self.config.pad_token_id, np.int32)
        mask = np.zeros((1, Tb), np.int32)
        padded[0, : len(ids)] = ids
        mask[0, : len(ids)] = 1
        return padded, mask, ids

    def _repad(self, prepared: Tuple, Tb: int) -> Tuple:
        """Right-pad a prepared (ids [1,T], mask [1,T], raw) payload to bucket
        ``Tb`` — cross-bucket admission fusion pads every pending admit to the
        largest bucket among them so they share one prefill program (prefill
        at these lengths is weight-stream-bound; the pad FLOPs are free)."""
        ids0, mask0 = prepared[0], prepared[1]
        T = ids0.shape[1]
        if T == Tb:
            return prepared
        if Tb < T:
            raise ValueError(f"_repad target {Tb} is smaller than payload length {T}")
        ids = np.full((1, Tb), self.config.pad_token_id, np.int32)
        mask = np.zeros((1, Tb), np.int32)
        ids[:, :T] = ids0
        mask[:, :T] = mask0
        return (ids, mask) + tuple(prepared[2:])

    def _fusion_targets(self, buckets: List[int]) -> Dict[int, int]:
        """Map each distinct pending bucket to the bucket its group fuses to.
        Greedy ascending merge, gated so fused prefills stay weight-stream-
        bound: a bucket joins the current group only while it is at most
        ``fuse_max_bucket`` (the compute/HBM crossover length) and at most
        ``fuse_max_ratio`` x the group's smallest bucket. Buckets past the
        gate start their own group (same-bucket admissions still batch — the
        downstream grouping is by post-fusion bucket)."""
        distinct = sorted(set(buckets))
        targets: Dict[int, int] = {}
        group: List[int] = [distinct[0]]
        for Tb in distinct[1:]:
            if Tb <= self._fuse_max_bucket and Tb <= group[0] * self._fuse_max_ratio:
                group.append(Tb)
            else:
                for b in group:
                    targets[b] = group[-1]
                group = [Tb]
        for b in group:
            targets[b] = group[-1]
        return targets

    def _prepare_suffix(self, req: Request):
        """Host-side prep for a shared-prefix request: resolve the suffix
        tokens (``input_ids`` directly, or ``prompt_text`` through the
        frontend's BOS-stripping hook), bucket them against the room the
        prefix leaves, and right-pad. Prefetchable like ``_prepare_llm``."""
        entry = self._prefixes.get(req.prefix_id)
        if entry is None:
            raise KeyError(
                f"request {req.request_id!r} names unregistered prefix "
                f"{req.prefix_id!r} — call register_prefix first"
            )
        _, P, bos = entry
        if req.input_ids is not None:
            ids = np.asarray(req.input_ids, np.int32).reshape(-1)
        elif req.prompt_text is not None and self._suffix_tokenize is not None:
            ids = np.asarray(self._suffix_tokenize(req, bos), np.int32).reshape(-1)
        else:
            raise ValueError(
                "prefix requests need input_ids (post-BOS suffix tokens), or "
                "prompt_text on a frontend with a suffix tokenizer (for_vidlm)"
            )
        if len(ids) == 0:
            raise ValueError(
                f"request {req.request_id!r} has an empty suffix: the shared-"
                "prefix path needs at least one suffix token to anchor its "
                "first sampled position"
            )
        room = self.max_len - P
        b = self.length_bucket
        Tb = min(-(-len(ids) // b) * b, room) if b > 1 else len(ids)
        if len(ids) > Tb:
            raise ValueError(
                f"suffix ({len(ids)} tokens) exceeds the {room} rows prefix "
                f"{req.prefix_id!r} ({P} rows) leaves under max_len {self.max_len}"
            )
        padded = np.full((1, Tb), self.config.pad_token_id, np.int32)
        mask = np.zeros((1, Tb), np.int32)
        padded[0, : len(ids)] = ids
        mask[0, : len(ids)] = 1
        return padded, mask, ids

    def _default_prefill(self, req: Request, prepared: Any = None):
        padded, mask, ids = prepared if prepared is not None else self._prepare_llm(req)
        if padded.shape[1] not in self.stats.prefill_buckets:
            self.stats.prefill_buckets.append(padded.shape[1])
        self.stats.admit_buckets.append(padded.shape[1])
        small, first, n_valid = self._jit_prefill(
            self.decoder, self.llm_params, self.config,
            jnp.asarray(padded), jnp.asarray(mask), self._next_key(),
        )
        return small, first, n_valid, ids  # ids = speculative draft corpus

    # ------------------------------------------------------- admission prefetch
    def _start_prefetch(self) -> None:
        """Kick off host-side preparation of the queue head on a worker thread
        while the device is busy with a decode chunk. Pure host work
        (video decode, tokenizer, numpy) — no jax calls."""
        if self._prefetched is not None or not self._queue:
            return
        req = self._queue[0]
        # prefix requests always have engine-owned prep; others need the
        # frontend's hook (custom prefill fns without one stay unprefetched)
        prep = self._prepare_suffix if req.prefix_id is not None else self._prepare
        if prep is None:
            return
        import threading

        holder: Dict[str, Any] = {}

        def work():
            try:
                holder["payload"] = prep(req)
            except Exception as e:  # surfaced at admission
                holder["error"] = e

        t = threading.Thread(target=work, daemon=True)
        t.start()
        self._prefetched = (req.request_id, t, holder)

    def _take_prefetch(self, req: Request) -> Any:
        if self._prefetched is None or self._prefetched[0] != req.request_id:
            return None
        _, t, holder = self._prefetched
        self._prefetched = None
        t.join()
        if "error" in holder:
            raise holder["error"]
        self.stats.prefetch_hits += 1
        return holder["payload"]

    def _fail(self, req: Request, exc: BaseException) -> None:
        """Per-request fault absorption (the reference's eval-driver philosophy,
        reference ``scripts/eval_openended.py:169-188``): a corrupt video,
        over-budget prompt, or tokenizer error fails THAT request with
        ``finish_reason="error"`` — every in-flight slot and the rest of the
        queue keep serving."""
        overwatch.error(
            f"request {req.request_id} failed: {type(exc).__name__}: {exc}"
        )
        self._submit_t.pop(req.request_id, None)
        self.stats.errors += 1
        res = RequestResult(
            req.request_id,
            np.full((max(req.max_new_tokens, 1),), self.config.pad_token_id, np.int32),
            "error",
            error=f"{type(exc).__name__}: {exc}",
        )
        self._results[req.request_id] = res
        if self._result_callback is not None:
            self._result_callback(res)

    def _admit(self) -> None:
        # 1) drain the queue into (slot, request, prepared-payload) triples —
        #    host prep errors and over-budget prompts fail per-request here,
        #    BEFORE any device prefill is paid
        free = [i for i, s in enumerate(self._slots) if s.request is None]
        admits: List[Tuple[int, Request, Any]] = []
        prefix_admits: List[Tuple[int, Request, Any]] = []
        while free and self._queue:
            req = self._queue[0]
            try:
                prepared = self._take_prefetch(req)
            except Exception as e:
                self._queue.popleft()
                self._fail(req, e)
                continue
            self._queue.popleft()
            try:
                if req.prefix_id is not None:
                    if prepared is None:
                        prepared = self._prepare_suffix(req)
                    n = self._prefixes[req.prefix_id][1] + len(prepared[2])
                    if n + req.max_new_tokens > self.max_len:
                        raise ValueError(
                            f"prefix ({self._prefixes[req.prefix_id][1]}) + suffix "
                            f"({len(prepared[2])}) + max_new_tokens "
                            f"({req.max_new_tokens}) exceeds engine max_len {self.max_len}"
                        )
                    prefix_admits.append((free.pop(0), req, prepared))
                    continue
                if prepared is None and self._prepare is not None:
                    prepared = self._prepare(req)
                if self._prepared_len is not None and prepared is not None:
                    n = self._prepared_len(req, prepared)
                    if n + req.max_new_tokens > self.max_len:
                        raise ValueError(
                            f"prompt ({n} tokens) + max_new_tokens "
                            f"({req.max_new_tokens}) exceeds engine max_len {self.max_len}"
                        )
            except Exception as e:
                self._fail(req, e)
                continue
            admits.append((free.pop(0), req, prepared))

        # prefix admissions: suffix-only prefill, grouped by (prefix, bucket) —
        # same-(video, bucket) questions share one program AND one weight
        # stream, regardless of the frontend (the suffix path is engine-owned
        # LLM-level work even on VidLM engines, whose full-pipeline prefills
        # cannot batch)
        if prefix_admits:
            self.stats.admit_buckets.extend(it[2][0].shape[1] for it in prefix_admits)
            if self._fuse_buckets:
                # pad each prefix's pending suffixes toward its largest bucket
                # (gated like the main path) — same-(prefix, gate-group)
                # admits then share one program
                by_pid: Dict[str, List[int]] = {}
                for _, req, prepared in prefix_admits:
                    by_pid.setdefault(req.prefix_id, []).append(prepared[0].shape[1])
                ptargets = {pid: self._fusion_targets(bs) for pid, bs in by_pid.items()}
                prefix_admits = [
                    (s, r, self._repad(p, ptargets[r.prefix_id][p[0].shape[1]]))
                    for s, r, p in prefix_admits
                ]
            pgroups: Dict[Tuple[str, int], List[Tuple[int, Request, Any]]] = {}
            for item in prefix_admits:
                pgroups.setdefault((item[1].prefix_id, item[2][0].shape[1]), []).append(item)
            for (pid, Tb), items in pgroups.items():
                if Tb not in self.stats.prefill_buckets:
                    self.stats.prefill_buckets.append(Tb)
                cache, _P, _bos = self._prefixes[pid]
                n_real = len(items)
                n_prog = 1 << (n_real - 1).bit_length()  # pow2: bounded programs
                rows_ids = [it[2][0] for it in items] + [items[-1][2][0]] * (n_prog - n_real)
                rows_mask = [it[2][1] for it in items] + [items[-1][2][1]] * (n_prog - n_real)
                small, first, n_valid = self._jit_prefix_prefill(
                    self.decoder, self.llm_params, self.config, cache,
                    jnp.asarray(np.concatenate(rows_ids, axis=0)),
                    jnp.asarray(np.concatenate(rows_mask, axis=0)),
                    self._next_key(),
                )
                self.stats.prefills += 1
                self.stats.prefix_admissions += n_real
                if n_real > 1:
                    self.stats.batched_admissions += n_real
                if self._async_admission:
                    for row, (slot_idx, req, prepared) in enumerate(items):
                        self._place_async(slot_idx, req, small, first, n_valid, row,
                                          _P + len(prepared[2]), prepared[2])
                else:
                    first_h, n_valid_h = np.asarray(first), np.asarray(n_valid)
                    for row, (slot_idx, req, prepared) in enumerate(items):
                        self._place(slot_idx, req, small, first, n_valid, row,
                                    int(first_h[row]), int(n_valid_h[row]), prepared[2])
        if not admits:
            return

        # 2) prefill. Same-bucket pending admissions on the default LLM path
        #    fuse into ONE prefill program (the weight HBM stream — the cost of
        #    a short-prompt prefill — is paid once for all of them); custom
        #    prefill fns run per-request.
        if self._can_batch_prefill:
            self.stats.admit_buckets.extend(it[2][0].shape[1] for it in admits)
            if self._fuse_buckets and len(admits) > 1:
                targets = self._fusion_targets([it[2][0].shape[1] for it in admits])
                admits = [
                    (s, r, self._repad(p, targets[p[0].shape[1]])) for s, r, p in admits
                ]
            groups: Dict[int, List[Tuple[int, Request, Any]]] = {}
            for item in admits:
                groups.setdefault(item[2][0].shape[1], []).append(item)
            for Tb, items in groups.items():
                if Tb not in self.stats.prefill_buckets:
                    self.stats.prefill_buckets.append(Tb)
                # pad the admission batch to a power of two (repeat the last
                # row; extras are never placed) so compiled prefill programs
                # stay bounded at buckets x (1 + log2(slots)) instead of
                # buckets x slots — compiles are minutes on real hardware
                n_real = len(items)
                n_prog = 1 << (n_real - 1).bit_length()
                rows_ids = [it[2][0] for it in items] + [items[-1][2][0]] * (n_prog - n_real)
                rows_mask = [it[2][1] for it in items] + [items[-1][2][1]] * (n_prog - n_real)
                small, first, n_valid = self._jit_prefill(
                    self.decoder, self.llm_params, self.config,
                    jnp.asarray(np.concatenate(rows_ids, axis=0)),
                    jnp.asarray(np.concatenate(rows_mask, axis=0)),
                    self._next_key(),
                )
                self.stats.prefills += 1
                if n_real > 1:
                    self.stats.batched_admissions += n_real
                if self._async_admission:
                    for row, (slot_idx, req, prepared) in enumerate(items):
                        self._place_async(slot_idx, req, small, first, n_valid, row,
                                          len(prepared[2]), prepared[2])
                else:
                    first_h, n_valid_h = np.asarray(first), np.asarray(n_valid)
                    for row, (slot_idx, req, prepared) in enumerate(items):
                        self._place(slot_idx, req, small, first, n_valid, row,
                                    int(first_h[row]), int(n_valid_h[row]), prepared[2])
        else:
            for slot_idx, req, prepared in admits:
                try:
                    out = self._prefill_request(req, prepared)
                except Exception as e:
                    self._fail(req, e)  # slot stays free for the next _admit
                    continue
                small, first, n_valid = out[:3]
                lookup = out[3] if len(out) > 3 else None
                if self.spec_gamma and lookup is None:
                    raise ValueError(
                        "speculative mode needs the prefill fn to return the prompt "
                        "token ids as a 4th element (the draft corpus)"
                    )
                self.stats.prefills += 1
                if (
                    self._async_admission
                    and self._prepared_len is not None
                    and prepared is not None
                ):
                    # custom per-request prefills pipeline too when the
                    # frontend exposes a host-side length bound (for_vidlm
                    # does); otherwise placement blocks on the readback so
                    # the post-prefill budget backstop can run
                    self._place_async(slot_idx, req, small, first, n_valid, 0,
                                      self._prepared_len(req, prepared), lookup)
                else:
                    self._place(slot_idx, req, small, first, n_valid, 0,
                                int(first[0]), int(n_valid[0]), lookup)

    def _place(
        self,
        slot_idx: int,
        req: Request,
        small: Tuple,
        first: Array,
        n_valid: Array,
        row: int,
        first_i: int,
        n: int,
        lookup: Any,
    ) -> None:
        """Splice prefilled request ``row`` into ``slot_idx`` (or finish it
        immediately). ``n``/``first_i`` are the host-synced scalars."""
        if n + req.max_new_tokens > self.max_len:
            # backstop for prefill fns whose prepared payload under-counts the
            # final sequence (e.g. a custom multimodal splice): the device
            # prefill was paid, but only this request fails
            self._fail(req, ValueError(
                f"prompt ({n} tokens) + max_new_tokens ({req.max_new_tokens}) "
                f"exceeds engine max_len {self.max_len}"
            ))
            return
        t0 = self._submit_t.pop(req.request_id, None)
        if t0 is not None:
            self.stats.ttft_s.append(time.perf_counter() - t0)
        if req.max_new_tokens == 1 or first_i == self.config.eos_token_id:
            self._finish(req, [first_i], "eos" if first_i == self.config.eos_token_id else "budget")
            return
        slot = self._slots[slot_idx]
        self._cache, self._last_tok = _insert_into_slot(
            self._cache, self._last_tok,
            small, jnp.int32(row), jnp.int32(slot_idx), n_valid[row], first[row],
        )
        if self._spec_capable and lookup is not None:
            # host draft-corpus mirror: estimation while disabled + device
            # hist rebuild on re-enable both read prompt_ids + emitted
            lk_host = [int(t) for t in np.asarray(lookup, np.int32).reshape(-1)]
            slot.prompt_ids = lk_host
            slot.est_pos = len(lk_host) + 1
        elif self._spec_capable:
            slot.prompt_ids, slot.est_pos = None, 0
        if self.spec_gamma:
            hc = self._hist.shape[1]
            hrow = np.full((hc,), self.config.pad_token_id, np.int32)
            lk = np.asarray(lookup, np.int32).reshape(-1)[: hc - 1]
            hrow[: len(lk)] = lk
            hrow[len(lk)] = first_i
            self._hist = self._hist.at[slot_idx].set(jnp.asarray(hrow))
            self._hist_len = self._hist_len.at[slot_idx].set(len(lk) + 1)
        slot.request = req
        slot.emitted = [first_i]
        slot.done = False

    def _place_async(
        self,
        slot_idx: int,
        req: Request,
        small: Tuple,
        first: Array,
        n_valid: Array,
        row: int,
        n_host: int,
        lookup: Any,
    ) -> None:
        """Non-blocking :meth:`_place`: splice request ``row`` into
        ``slot_idx`` WITHOUT reading the first sampled token back to the host
        — the insert and the next decode chunk queue behind the prefill on
        the device, and the first token resolves at that chunk's sync
        (``pending_first``). The budget check uses the host-known sequence
        length ``n_host`` (prompt tokens, + prefix rows on the suffix path),
        which the engine-owned prep paths compute exactly."""
        if n_host + req.max_new_tokens > self.max_len:
            self._fail(req, ValueError(
                f"prompt ({n_host} tokens) + max_new_tokens ({req.max_new_tokens}) "
                f"exceeds engine max_len {self.max_len}"
            ))
            return
        slot = self._slots[slot_idx]
        self._cache, self._last_tok = _insert_into_slot(
            self._cache, self._last_tok,
            small, jnp.int32(row), jnp.int32(slot_idx), n_valid[row], first[row],
        )
        if self._spec_capable and lookup is not None:
            lk_host = [int(t) for t in np.asarray(lookup, np.int32).reshape(-1)]
            slot.prompt_ids = lk_host
            slot.est_pos = len(lk_host) + 1
        elif self._spec_capable:
            slot.prompt_ids, slot.est_pos = None, 0
        if self.spec_gamma:
            # device-side hist write: the first token is still on device, so
            # the draft corpus update joins the dispatch queue instead of
            # forcing a readback
            hc = self._hist.shape[1]
            hrow = np.full((hc,), self.config.pad_token_id, np.int32)
            lk = np.asarray(lookup, np.int32).reshape(-1)[: hc - 1]
            hrow[: len(lk)] = lk
            self._hist = self._hist.at[slot_idx].set(jnp.asarray(hrow))
            self._hist = self._hist.at[slot_idx, len(lk)].set(first[row])
            self._hist_len = self._hist_len.at[slot_idx].set(len(lk) + 1)
        slot.request = req
        slot.emitted = []
        slot.pending_first = (first, row)
        slot.done = False

    def _resolve_pending_firsts(self) -> None:
        """Read back the first sampled token of every async-placed slot (one
        host readback per admission event's shared ``first`` array — the
        values are ready by the time the following chunk has synced). An EOS
        first token marks the slot done so the chunk's tokens for it are
        discarded, exactly matching blocking placement's immediate finish."""
        fetched: Dict[int, np.ndarray] = {}
        for slot in self._slots:
            if slot.request is None or slot.pending_first is None:
                continue
            arr, row = slot.pending_first
            host = fetched.get(id(arr))
            if host is None:
                host = np.asarray(arr)
                fetched[id(arr)] = host
            first_i = int(host[row])
            slot.pending_first = None
            slot.emitted = [first_i]
            t0 = self._submit_t.pop(slot.request.request_id, None)
            if t0 is not None:
                self.stats.ttft_s.append(time.perf_counter() - t0)
            if first_i == self.config.eos_token_id:
                slot.done = True

    def _decode_one_chunk(self) -> None:
        spec_steps0, spec_emitted0 = self.stats.spec_steps, self.stats.spec_emitted
        done_in = jnp.asarray([s.done for s in self._slots])
        if self.spec_gamma:
            wins, emits, self._cache, self._last_tok, _, self._hist, self._hist_len = (
                _decode_chunk_spec(
                    self.decoder, self.llm_params, self._cache, self._last_tok,
                    done_in, self.config, self.steps_per_sync,
                    self.spec_gamma, self.spec_ngram, self._hist, self._hist_len,
                    self._next_key(),
                )
            )
            # overlap the queue head's host prep with the running chunk
            # (dispatch is async; np.asarray below is the blocking sync)
            self._start_prefetch()
            # [K, B, gamma+1] windows + [K, B] counts — one host sync per chunk
            wins, emits = np.asarray(wins), np.asarray(emits)
            step_tokens = [
                [wins[k, b, : emits[k, b]] for b in range(self.num_slots)]
                for k in range(self.steps_per_sync)
            ]
        else:
            toks, self._cache, self._last_tok, _ = _decode_chunk(
                self.decoder, self.llm_params, self._cache, self._last_tok,
                done_in, self.config, self.steps_per_sync, self._next_key(),
            )
            self._start_prefetch()  # overlap host prep with the running chunk
            toks = np.asarray(toks)  # [K, B] — the one host sync per chunk
            step_tokens = [
                [toks[k, b : b + 1] for b in range(self.num_slots)]
                for k in range(self.steps_per_sync)
            ]
        self._resolve_pending_firsts()
        self.stats.decode_chunks += 1
        self.stats.decode_steps += self.steps_per_sync
        for slot_idx, slot in enumerate(self._slots):
            if slot.request is None:
                self.stats.slot_steps_idle += self.steps_per_sync
                continue
            req = slot.request
            active_steps = 0
            for k in range(self.steps_per_sync):
                if slot.done or len(slot.emitted) >= req.max_new_tokens:
                    break
                consumed_k = 0
                for t in step_tokens[k][slot_idx]:
                    if slot.done or len(slot.emitted) >= req.max_new_tokens:
                        break
                    consumed_k += 1
                    slot.emitted.append(int(t))
                    if int(t) == self.config.eos_token_id:
                        slot.done = True
                if consumed_k:
                    active_steps += 1
                    if self.spec_gamma:
                        self.stats.spec_steps += 1
                        self.stats.spec_emitted += consumed_k
            self.stats.slot_steps_active += active_steps
            self.stats.slot_steps_idle += self.steps_per_sync - active_steps
            if self._spec_off_by_monitor and not self.spec_gamma and slot.prompt_ids is not None:
                # zero-device-cost acceptance estimate: simulate the n-gram
                # drafter over the tokens plain decode just emitted
                h = slot.prompt_ids + slot.emitted
                s_, e_ = _sim_spec_steps(
                    h, max(slot.est_pos, len(slot.prompt_ids) + 1),
                    self._spec_gamma0, self.spec_ngram, self.config.pad_token_id,
                )
                self._est_win_steps += s_
                self._est_win_emitted += e_
                slot.est_pos = len(h)
            if slot.done or len(slot.emitted) >= req.max_new_tokens:
                self._finish(req, slot.emitted, "eos" if slot.done else "budget")
                slot.request, slot.emitted, slot.done = None, [], True
                slot.prompt_ids, slot.est_pos = None, 0
        self._spec_monitor(
            self.stats.spec_steps - spec_steps0, self.stats.spec_emitted - spec_emitted0
        )

    def _spec_monitor(self, dsteps: int, demitted: int) -> None:
        """Per-chunk speculation governor (two-way when autodisable=True):
        trailing-window realized tokens/verify-step decides disable; the
        host acceptance estimate (accumulated by the slot loop while
        disabled) decides re-enable. ``dsteps``/``demitted`` are this
        chunk's verify-step deltas."""
        if not self._spec_capable:
            return
        if not self.spec_autodisable:
            # advisory-only mode: warn once when the cumulative run is a loss
            if (
                self.spec_gamma
                and not self._spec_warned
                and self.stats.spec_steps >= self._spec_probe_steps
                and self.stats.tokens_per_step < self.spec_break_even
            ):
                self._spec_warned = True
                overwatch.warning(
                    f"speculative decoding realized {self.stats.tokens_per_step:.3f} "
                    f"tokens/step over {self.stats.spec_steps} verify steps — below the "
                    f"{self.spec_break_even:.2f}x break-even: this workload's n-gram "
                    "acceptance is too low for gamma to pay; consider "
                    "speculative_gamma=0 or speculative_autodisable=True"
                )
            return
        # two-way monitor: trailing windows, hysteresis on re-enable
        if self.spec_gamma:
            self._spec_win_steps += dsteps
            self._spec_win_emitted += demitted
            if self._spec_win_steps >= self._spec_probe_steps:
                realized = self._spec_win_emitted / self._spec_win_steps
                if realized < self.spec_break_even:
                    overwatch.warning(
                        f"speculative decoding realized {realized:.3f} tokens/step "
                        f"over the trailing {self._spec_win_steps} verify steps — "
                        f"below the {self.spec_break_even:.2f}x break-even; falling "
                        "back to plain decode (the monitor re-enables when the "
                        "trailing acceptance estimate clears break-even)"
                    )
                    self.spec_gamma = 0
                    self._spec_off_by_monitor = True
                    self.stats.spec_disables += 1
                    self._est_win_steps = self._est_win_emitted = 0
                    for s in self._slots:
                        if s.prompt_ids is not None:
                            s.est_pos = len(s.prompt_ids) + len(s.emitted)
                self._spec_win_steps = self._spec_win_emitted = 0
        elif self._spec_off_by_monitor and self._est_win_steps >= self._spec_probe_steps:
            self._maybe_reenable_spec()

    def _maybe_reenable_spec(self) -> None:
        """Re-enable speculation when the trailing-window host estimate of
        realized tokens/verify-step clears break-even x a hysteresis margin;
        gamma is picked from the measured per-gamma verify-cost curve
        (BASELINE.md round-4 chip table) against per-gamma simulated
        acceptance on the live slots' recent streams — not the CLI value."""
        est = self._est_win_emitted / self._est_win_steps
        self._est_win_steps = self._est_win_emitted = 0
        if est < self.spec_break_even * self._spec_reenable_margin:
            return
        best_g, best_speedup = self._spec_gamma0, 0.0
        for g in (2, 4, 8):
            steps = emitted = 0
            for slot in self._slots:
                if slot.request is None or slot.prompt_ids is None:
                    continue
                h = slot.prompt_ids + slot.emitted
                s_, e_ = _sim_spec_steps(
                    h, len(slot.prompt_ids) + 1, g, self.spec_ngram,
                    self.config.pad_token_id,
                )
                steps += s_
                emitted += e_
            if steps == 0:
                continue
            speedup = (emitted / steps) / _spec_cost_ratio(g)
            if speedup > best_speedup:
                best_g, best_speedup = g, speedup
        overwatch.info(
            f"[*] speculation re-enabled: trailing estimate {est:.3f} tokens/step "
            f"clears break-even {self.spec_break_even:.2f} x margin "
            f"{self._spec_reenable_margin:.2f}; gamma={best_g} from the measured "
            "cost curve"
        )
        self._rebuild_device_hist()
        self.spec_gamma = best_g
        self._spec_off_by_monitor = False
        self.stats.spec_reenables += 1
        self._spec_win_steps = self._spec_win_emitted = 0

    def _rebuild_device_hist(self) -> None:
        """Write live slots' host histories back into the device draft-corpus
        buffers (they went stale while speculation was disabled)."""
        hc = self._hist.shape[1]
        hmat = np.full((self.num_slots, hc), self.config.pad_token_id, np.int32)
        hlen = np.zeros((self.num_slots,), np.int32)
        for idx, slot in enumerate(self._slots):
            if slot.request is None or slot.prompt_ids is None:
                continue
            h = slot.prompt_ids + slot.emitted
            if len(h) > hc:
                h = h[-hc:]  # recency window: only recent tokens drive drafting
            hmat[idx, : len(h)] = h
            hlen[idx] = len(h)
        hist, hist_len = jnp.asarray(hmat), jnp.asarray(hlen)
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self._mesh, P())
            hist, hist_len = jax.device_put(hist, repl), jax.device_put(hist_len, repl)
        self._hist, self._hist_len = hist, hist_len

    def _finish(self, req: Request, emitted: List[int], reason: str) -> None:
        out = np.full((req.max_new_tokens,), self.config.pad_token_id, np.int32)
        out[: len(emitted)] = emitted[: req.max_new_tokens]
        res = RequestResult(req.request_id, out, reason)
        self._results[req.request_id] = res
        if self._result_callback is not None:
            self._result_callback(res)

    # ------------------------------------------------------------- frontends
    @classmethod
    def for_vidlm(cls, vidlm: Any, params: PyTree, **kwargs: Any) -> "ContinuousBatchingEngine":
        """Engine over a full MERV VidLM: requests carry ``prompt_text`` (+
        optional ``video``); prefill runs the whole multimodal pipeline
        (towers -> projectors -> fusion -> splice -> prompt prefill) as one
        jitted program per prompt-length bucket, exactly like
        ``generate_batch`` does (merv.py::generate_ids) but at B=1."""
        decoder = vidlm.llm_backbone.decoder
        engine = cls(decoder, params["llm_backbone"], **kwargs)
        jitted: Dict[Tuple[int, ...], Any] = {}

        def mm_prefill(params_, ids, mask, videos, is_mm, rng):
            feats = vidlm.encode_videos(params_, videos, None)
            visual, _ = vidlm.project_and_fuse(params_, feats)
            embeds, m2, _ = vidlm.embed_multimodal(params_, ids, mask, visual, None, is_mm)
            Tc = embeds.shape[1]
            cache_dtype = (
                jnp.int8 if engine.config.kv_cache_dtype == "int8" else decoder.cfg.compute_dtype
            )
            cache = KVCache.create(decoder.cfg, 1, Tc, dtype=cache_dtype)
            am = m2.astype(jnp.int32)
            positions = jnp.maximum(jnp.cumsum(am, axis=1) - 1, 0)
            n_valid = jnp.sum(am, axis=1)
            logits, cache = decoder(
                params_["llm_backbone"], inputs_embeds=embeds, attention_mask=am,
                positions=positions, kv_cache=cache, logits_indices=n_valid - 1,
            )
            first_logits = _ban_eos_below_min_length(
                logits[:, 0].astype(jnp.float32), n_valid, engine.config
            )
            first = _sample_token(first_logits, rng, engine.config)
            return (cache.k, cache.v, cache.k_scale, cache.v_scale), first, n_valid

        def prepare(req: Request):
            """Host side (video decode + per-encoder transforms + tokenizer) —
            runs on the prefetch thread while the device decodes a chunk."""
            if req.prompt_text is None:
                raise ValueError("VidLM engine requests need prompt_text")
            return vidlm._prepare_batch_inputs(
                [req.video], [req.prompt_text], length_bucket=engine.length_bucket,
            )

        def prefill_request(req: Request, prepared: Any = None):
            ids, mask, vids, is_mm = prepared if prepared is not None else prepare(req)
            key = (ids.shape[1],)
            fn = jitted.get(key)
            if fn is None:
                fn = jitted[key] = jax.jit(mm_prefill)
                engine.stats.prefill_buckets.append(ids.shape[1])
            small, first, n_valid = fn(params, ids, mask, vids, is_mm, engine._next_key())
            lookup = np.asarray(ids)[0][: int(np.asarray(mask).sum())]
            return small, first, n_valid, lookup  # text ids = draft corpus

        def prepared_len(req: Request, prepared: Any) -> int:
            """Expected post-splice sequence length (text + visual tokens for
            multimodal rows) — lets admission reject over-budget requests
            before the tower+prefill program runs."""
            _, mask, _, is_mm = prepared
            n = int(np.asarray(mask).sum())
            if bool(np.asarray(is_mm).reshape(-1)[0]):
                n += vidlm.visual_feature_length
            return n

        def suffix_tokenize(req: Request, bos: Tuple[int, ...]) -> np.ndarray:
            """prompt_text -> post-BOS suffix ids, validating the prompt's own
            BOS against the ids baked into the registered prefix (mirrors
            ``MERV.generate_batch_shared``'s host-side checks)."""
            ids = vidlm.llm_backbone.tokenizer(req.prompt_text, truncation=True).input_ids
            nbos = vidlm.llm_backbone.bos_token_length
            if nbos and tuple(ids[:nbos]) != bos:
                raise ValueError(
                    f"prompt tokenizes to bos_ids={tuple(ids[:nbos])} but prefix "
                    f"{req.prefix_id!r} was built with bos_ids={bos}"
                )
            return np.asarray(ids[nbos:], np.int32)

        def register_prefix_video(
            prefix_id: str, video: Any, num_frames=None, clip_args=None
        ) -> None:
            """Towers + fusion + [BOS | visual] prefill ONCE; every request
            naming ``prefix_id`` then pays only its question suffix — the
            engine-side form of ``MERV.generate_batch_shared`` (reference eval
            sets ask several questions per video; the reference recomputes the
            full video prefill per question, merv.py:779-830)."""
            vp = vidlm.build_video_prefix(
                params, video, num_frames, clip_args,
                kv_cache_dtype=engine.config.kv_cache_dtype,
            )
            engine.register_prefix(prefix_id, vp)

        engine._prepare = prepare
        engine._prefill_request = prefill_request
        engine._prepared_len = prepared_len
        engine._suffix_tokenize = suffix_tokenize
        engine.register_prefix_video = register_prefix_video
        # the batched-admission fast path is LLM-payload-specific (pads ids/
        # masks into one prefill); the multimodal payload must go through
        # prefill_request per-request or towers would silently be skipped —
        # EXCEPT prefix_id requests, which ride the engine-owned suffix path
        # (and do batch, grouped per prefix)
        engine._can_batch_prefill = False
        return engine
