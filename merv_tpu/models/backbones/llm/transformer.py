"""Functional Llama-family causal decoder (Llama-2/3/3.1, Vicuna, Qwen-2.5).

TPU-first redesign of the reference's HF ``{Model}ForCausalLM`` usage
(reference ``merv/models/backbones/llm/base_llm.py:114-138``): one generic
decoder covering every LLM family the reference registers
(``merv/models/materialize.py:77-101``), as a pure function over a parameter
pytree so the whole forward/backward compiles to a single XLA program.

TPU-native choices:
- ``lax.scan`` over layers with stacked per-layer parameters: one compiled
  layer body instead of 32 unrolled blocks (fast compiles, weight-update
  friendly), with ``jax.checkpoint`` on the scanned body as the analogue of the
  reference's per-decoder-layer activation checkpointing
  (``merv/training/strategies/fsdp.py:243-256``).
- Attention runs through :func:`merv_tpu.ops.attention.attention` — the Pallas
  flash kernel on TPU (replacing flash-attn 2 CUDA), XLA reference elsewhere.
- KV cache is a preallocated ``[L, B, H_kv, max_len, D]`` buffer updated with
  ``lax.dynamic_update_slice`` — static shapes, so prefill and decode are two
  fixed XLA programs (the decode hot loop never re-traces).
- bf16 compute / fp32 params policy per the reference's autocast semantics.

Parameter tree layout (paths matter: sharding rules + HF import key on them):

    embed_tokens/embedding                     [V, E]
    layers/attn/{q,k,v,o}_proj/kernel          [L, ...]   (stacked)
    layers/attn/{q,k,v}_proj/bias              [L, ...]   (qwen2 only)
    layers/input_norm/scale, post_attn_norm/scale
    layers/mlp/{gate,up,down}_proj/kernel
    final_norm/scale
    lm_head/kernel                             [E, V]     (absent if tied)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from merv_tpu.nn.core import Embed, Linear, RMSNorm, normal_init
from merv_tpu.ops.attention import attention
from merv_tpu.parallel.sharding import constrain_batch_dim, get_activation_mesh

Array = jax.Array
PyTree = Any


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    attention_bias: bool = False          # qwen2: bias on q/k/v only
    tie_word_embeddings: bool = False
    initializer_range: float = 0.02
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # Unroll factor for the NO-CACHE layer scan only (prefill-logits /
    # training forward): unrolled bodies let XLA overlap the next layer's
    # weight fetch with the current layer's GEMMs (same trick as
    # ViTConfig.scan_unroll). The cache-carrying scans (serving prefill +
    # decode) always run unroll=1 — unrolled bodies defeat the in-place
    # aliasing of the carried KV buffer (measured collapse, see __call__).
    # Schedule-only: same math at any value (fp32 bit-identical; bf16 CPU
    # outputs can differ by 1 ulp from convert placement across fusion
    # boundaries — tests/test_scan_unroll.py pins both).
    scan_unroll: int = 1
    # Sequence/context parallelism (capability beyond the reference, which
    # caps llm_max_length at 2048 and has no long-sequence story — SURVEY
    # §5.7): when True AND the active mesh (parallel.sharding.activation_mesh
    # scope) has an 'sp' axis > 1, the NO-CACHE forward shards activations'
    # sequence dim over 'sp' and runs attention as an ICI ring
    # (ops/ring_attention.py). Cache-carrying paths (serving) ignore it.
    sequence_parallel: bool = False
    # Load-balanced causal ring (zigzag token layout, ring_attention.py
    # zigzag_perm): halves per-step ring compute by pairing early/late chunks
    # per device. Applied when the sequence tiles 2*sp; one gather in + one
    # out per forward (amortized over the whole layer stack). Numerics are
    # identical (tests pin it); the flag exists to A/B the schedule.
    sp_zigzag: bool = True
    # Pipeline parallelism (capability beyond the reference): when True AND
    # the active mesh has a 'pp' axis > 1, the NO-CACHE forward shards the
    # stacked layer params over 'pp' and runs a microbatched GPipe schedule
    # (parallel/pipeline.py) instead of the layer scan. pp_microbatches = 0
    # picks min(2*pp, batch). Mutually exclusive with sequence_parallel
    # (nested manual shard_maps over different axes are not supported).
    pipeline_parallel: bool = False
    pp_microbatches: int = 0

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


class KVCache(NamedTuple):
    """Static-shape KV cache for all layers.

    ``dtype=jnp.int8`` stores keys/values quantized per (batch, head,
    position) with fp32 scales (``k_scale``/``v_scale``,
    [L, B, H_kv, max_len, 1]): decode streams the whole cache every step, so
    halving its bytes trims the HBM-bound per-token latency; the ~3% scale
    overhead rides along. Quantize-on-write / dequantize-on-read live in
    ``LlamaDecoder._layer``.
    """

    k: Array  # [L, B, H_kv, max_len, D]
    v: Array  # [L, B, H_kv, max_len, D]
    # number of valid positions: scalar int32 (whole batch shares one write
    # pointer — batch prefill + lockstep decode), or [B] int32 (per-slot
    # pointers for the continuous-batching engine; T=1 decode steps and
    # T=gamma+1 speculative-verify steps)
    length: Array
    k_scale: Optional[Array] = None  # [L, B, H_kv, max_len, 1] f32 (int8 mode)
    v_scale: Optional[Array] = None

    @classmethod
    def create(cls, cfg: DecoderConfig, batch: int, max_len: int, dtype: Any = jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
        if dtype == jnp.int8:
            sshape = shape[:-1] + (1,)
            return cls(
                jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8), jnp.zeros((), jnp.int32),
                jnp.ones(sshape, jnp.float32), jnp.ones(sshape, jnp.float32),
            )
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32))


def _quantize_kv(x: Array) -> Tuple[Array, Array]:
    """[B, H, T, D] float -> (int8 values, [B, H, T, 1] f32 scales)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _rope(cos_sin: Tuple[Array, Array], x: Array) -> Array:
    """Apply rotary embedding. x: [B, H, T, D]; cos/sin: [B, T, D]."""
    cos, sin = cos_sin
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


def _rope_tables(cfg: DecoderConfig, positions: Array, dtype: Any) -> Tuple[Array, Array]:
    """cos/sin tables for given positions [B, T] -> ([B, T, D], [B, T, D])."""
    d2 = cfg.head_dim // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, d2, dtype=jnp.float32) / d2))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq[None, None, :]  # [B, T, d2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [B, T, D] (HF half-split convention)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


@dataclass(frozen=True)
class LlamaDecoder:
    cfg: DecoderConfig

    # -- sequence parallelism ----------------------------------------------------------

    def _sp_mesh(self, seq_len: int):
        """The active mesh when sp-axis ring attention should run (else None):
        cfg.sequence_parallel on, a traced activation mesh with sp>1, and a
        sequence that tiles the ring. Divisibility tolerance mirrors
        constrain_batch_dim (tiny tests fall back to plain attention)."""
        if not self.cfg.sequence_parallel:
            return None
        mesh = get_activation_mesh()
        from merv_tpu.parallel.mesh import SEQ_AXIS

        if mesh is None or mesh.shape.get(SEQ_AXIS, 1) <= 1 or seq_len % mesh.shape[SEQ_AXIS] != 0:
            return None
        return mesh

    def _pp_mesh(self, batch: int):
        """The active mesh when pp-axis GPipe should run (else None): cfg flag
        on, a traced activation mesh with pp>1, layers tile the stages, and a
        microbatch count exists. Divisibility failures fall back to the plain
        scan (mirrors _sp_mesh's tolerance for tiny tests)."""
        if not self.cfg.pipeline_parallel:
            return None
        from merv_tpu.parallel.mesh import PIPE_AXIS, SEQ_AXIS
        from merv_tpu.parallel.pipeline import resolve_microbatches

        mesh = get_activation_mesh()
        if mesh is None or mesh.shape.get(PIPE_AXIS, 1) <= 1:
            return None
        pp = mesh.shape[PIPE_AXIS]
        if self.cfg.num_layers % pp != 0:
            return None
        if resolve_microbatches(batch, pp, self.cfg.pp_microbatches) is None:
            return None
        if self.cfg.sequence_parallel and mesh.shape.get(SEQ_AXIS, 1) > 1:
            raise ValueError(
                "pipeline_parallel and sequence_parallel cannot both be active "
                "on one mesh (pp>1 and sp>1): the GPipe shard_map cannot nest "
                "the sp ring shard_map. Pick one per run."
            )
        return mesh

    def _sp_serve_mesh(self, cache_len: int):
        """The active mesh when serving should attend an sp-SHARDED KV cache
        (else None): cfg.sequence_parallel on, a traced activation mesh with
        sp>1, and a cache buffer that tiles the axis."""
        if not self.cfg.sequence_parallel:
            return None
        mesh = get_activation_mesh()
        from merv_tpu.parallel.mesh import SEQ_AXIS

        if mesh is None or mesh.shape.get(SEQ_AXIS, 1) <= 1 or cache_len % mesh.shape[SEQ_AXIS] != 0:
            return None
        return mesh

    def _constrain_h(self, h: Array) -> Array:
        """Activation constraint at layer boundaries: batch over data/fsdp,
        plus the sequence dim over 'sp' when sequence parallelism is live."""
        mesh = self._sp_mesh(h.shape[1])
        if mesh is not None:
            from merv_tpu.ops.ring_attention import constrain_seq_dim

            return constrain_seq_dim(h, mesh)
        return constrain_batch_dim(h)

    # -- submodule builders ----------------------------------------------------------

    def _modules(self) -> Dict[str, Any]:
        c = self.cfg
        init = normal_init(c.initializer_range)
        lin = lambda i, o, b: Linear(i, o, use_bias=b, param_dtype=c.param_dtype, kernel_init=init)  # noqa: E731
        return {
            "embed": Embed(c.vocab_size, c.hidden_size, param_dtype=c.param_dtype),
            "q_proj": lin(c.hidden_size, c.q_dim, c.attention_bias),
            "k_proj": lin(c.hidden_size, c.kv_dim, c.attention_bias),
            "v_proj": lin(c.hidden_size, c.kv_dim, c.attention_bias),
            "o_proj": lin(c.q_dim, c.hidden_size, False),
            "gate_proj": lin(c.hidden_size, c.intermediate_size, False),
            "up_proj": lin(c.hidden_size, c.intermediate_size, False),
            "down_proj": lin(c.intermediate_size, c.hidden_size, False),
            "input_norm": RMSNorm(c.hidden_size, eps=c.rms_norm_eps, param_dtype=c.param_dtype),
            "post_attn_norm": RMSNorm(c.hidden_size, eps=c.rms_norm_eps, param_dtype=c.param_dtype),
            "final_norm": RMSNorm(c.hidden_size, eps=c.rms_norm_eps, param_dtype=c.param_dtype),
            "lm_head": lin(c.hidden_size, c.vocab_size, False),
        }

    def init(self, key: Array) -> PyTree:
        c = self.cfg
        m = self._modules()
        keys = jax.random.split(key, 4 + c.num_layers)

        def layer_params(k: Array) -> PyTree:
            ks = jax.random.split(k, 7)
            p = {
                "attn": {
                    "q_proj": m["q_proj"].init(ks[0]),
                    "k_proj": m["k_proj"].init(ks[1]),
                    "v_proj": m["v_proj"].init(ks[2]),
                    "o_proj": m["o_proj"].init(ks[3]),
                },
                "mlp": {
                    "gate_proj": m["gate_proj"].init(ks[4]),
                    "up_proj": m["up_proj"].init(ks[5]),
                    "down_proj": m["down_proj"].init(ks[6]),
                },
                "input_norm": m["input_norm"].init(ks[0]),
                "post_attn_norm": m["post_attn_norm"].init(ks[0]),
            }
            return p

        # stacked layer params: leading dim L on every leaf
        layers = jax.vmap(layer_params)(keys[4 : 4 + c.num_layers])
        params = {
            "embed_tokens": m["embed"].init(keys[0]),
            "layers": layers,
            "final_norm": m["final_norm"].init(keys[1]),
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = m["lm_head"].init(keys[2])
        return params

    # -- forward ---------------------------------------------------------------------

    def embed_input_ids(self, params: PyTree, input_ids: Array) -> Array:
        return Embed(self.cfg.vocab_size, self.cfg.hidden_size)(
            params["embed_tokens"], input_ids, dtype=self.cfg.compute_dtype
        )

    def _layer(
        self,
        lp: PyTree,
        h: Array,
        cos_sin: Tuple[Array, Array],
        kv_mask: Optional[Array],
        cache_kv: Optional[Tuple[Array, Array, Optional[Array], Optional[Array]]],
        cache_len: Optional[Array],
        causal: bool,
        attn_impl: str,
        layer_idx: Optional[Array] = None,
        sp_zigzag: bool = False,
    ) -> Tuple[Array, Optional[Tuple[Array, Array, Optional[Array], Optional[Array]]]]:
        """One decoder block. ``cache_kv`` holds the FULL stacked [L, ...] cache
        buffers with ``layer_idx`` selecting this block's slice: the new k/v
        positions are written with an indexed dynamic_update_slice into the
        scan-carried buffer (a few KB touched in place), instead of routing
        per-layer cache slices through scan xs->ys — which forced XLA to copy
        the entire cache (~1.7 GB read+write per decode step at 7B full depth,
        measured: the copy was 2.3 ms of the 12.6 ms/token step; the carry
        restructure removes it).
        """
        c = self.cfg
        B, T, _ = h.shape
        m = self._modules()

        x = m["input_norm"](lp["input_norm"], h)
        # NOTE on packing: concatenating q/k/v into one GEMM AT TRACE TIME
        # measures FASTER in isolation at narrow widths but SLOWER here —
        # under lax.scan the concat materializes a fresh [D, 3D] buffer every
        # layer (~2x extra weight HBM traffic; whole-model bench regressed
        # 445 -> 473 ms). STORED-packed weights (pack_serving_params: one
        # [D, 3D] kernel on disk/HBM, no concat in the program) keep the
        # single-GEMM win without the traffic; the serving path uses them.
        if "qkv_proj" in lp["attn"]:
            qkv = Linear(c.hidden_size, c.q_dim + 2 * c.kv_dim,
                         use_bias=c.attention_bias, param_dtype=c.param_dtype)(lp["attn"]["qkv_proj"], x)
            q, k, v = jnp.split(qkv, [c.q_dim, c.q_dim + c.kv_dim], axis=-1)
            q = q.reshape(B, T, c.num_heads, c.head_dim)
            k = k.reshape(B, T, c.num_kv_heads, c.head_dim)
            v = v.reshape(B, T, c.num_kv_heads, c.head_dim)
        else:
            q = m["q_proj"](lp["attn"]["q_proj"], x).reshape(B, T, c.num_heads, c.head_dim)
            k = m["k_proj"](lp["attn"]["k_proj"], x).reshape(B, T, c.num_kv_heads, c.head_dim)
            v = m["v_proj"](lp["attn"]["v_proj"], x).reshape(B, T, c.num_kv_heads, c.head_dim)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))  # [B, H, T, D]

        q = _rope(cos_sin, q)
        k = _rope(cos_sin, k)

        new_cache = None
        per_slot = cache_len is not None and getattr(cache_len, "ndim", 0) == 1
        if cache_kv is not None:
            # stacked [L, B, Hkv, max_len, D] buffers (+ scales in int8 mode)
            ck_all, cv_all, cks_all, cvs_all = cache_kv
            li = layer_idx

            if per_slot:
                if T == 1:
                    # Continuous-batching decode: each slot writes its ONE new
                    # position at its own offset ``cache_len[b]``. A single
                    # scatter touches B*H*D elements of the scan-carried buffer
                    # (XLA aliases it in place, like the dynamic_update_slice
                    # below) — never a whole-slice rewrite, which would
                    # reintroduce the 2.3 ms/token cache copy this layout was
                    # built to kill.
                    # mode="drop": a slot whose host-side budget was reached
                    # mid-chunk keeps stepping until the next sync — its
                    # pointer may walk past the buffer; those writes must
                    # vanish, not wrap (the host retires the slot at sync)
                    def put(buf, val):  # val [B, H, 1, D] (or [B, H, 1, 1] scales)
                        return buf.at[li, jnp.arange(B), :, cache_len, :].set(
                            val[:, :, 0], mode="drop"
                        )
                else:
                    # Batched speculative verify: slot b writes its T draft
                    # positions at cache_len[b]..cache_len[b]+T-1 (a [B, T]
                    # scatter; still a few-KB in-place touch per step)
                    bidx = jnp.arange(B)[:, None]
                    pidx = cache_len[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]

                    def put(buf, val):  # val [B, H, T, D] (or [B, H, T, 1] scales)
                        # advanced indices (li, bidx, pidx) move to the front:
                        # target block is [B, T, H, D]. mode="drop": see T=1
                        return buf.at[li, bidx, :, pidx, :].set(
                            val.transpose(0, 2, 1, 3), mode="drop"
                        )
            else:
                def put(buf, val):
                    return jax.lax.dynamic_update_slice(buf, val[None], (li, 0, 0, cache_len, 0))

            def take(buf):
                return jax.lax.dynamic_index_in_dim(buf, li, 0, keepdims=False)

            if cks_all is not None:
                kq, ks = _quantize_kv(k)
                vq, vs = _quantize_kv(v)
                ck_all, cv_all = put(ck_all, kq), put(cv_all, vq)
                cks_all, cvs_all = put(cks_all, ks), put(cvs_all, vs)
                # scale in fp32 THEN round once to compute dtype (scaling a
                # bf16-cast int8 by a bf16-cast scale would round twice)
                k = (take(ck_all).astype(jnp.float32) * take(cks_all)).astype(q.dtype)
                v = (take(cv_all).astype(jnp.float32) * take(cvs_all)).astype(q.dtype)
            else:
                ck_all = put(ck_all, k.astype(ck_all.dtype))
                cv_all = put(cv_all, v.astype(cv_all.dtype))
                k, v = take(ck_all), take(cv_all)
            new_cache = (ck_all, cv_all, cks_all, cvs_all)

        sp_mesh = self._sp_mesh(T) if (cache_kv is None and kv_mask is None) else None
        sp_serve_mesh = self._sp_serve_mesh(k.shape[2]) if cache_kv is not None else None
        if sp_mesh is not None:
            from merv_tpu.ops.ring_attention import ring_attention

            out = ring_attention(
                q, k.astype(q.dtype), v.astype(q.dtype), sp_mesh,
                causal=causal, zigzag=sp_zigzag,
            )
        elif sp_serve_mesh is not None:
            # serving with an sp-SHARDED KV cache (long-video contexts): the
            # cache never moves — queries replicate, each chip attends its
            # cache shard, partials merge via the cross-chip online-softmax.
            # ``cache_len`` may be the engine's per-slot [B] pointer vector
            # (continuous batching x sp-sharded cache): pointers replicate,
            # only the cache's sequence dim shards, and the per-row causal
            # offset rides into the shard_map body
            from merv_tpu.ops.ring_attention import sharded_cache_attention

            out = sharded_cache_attention(
                q, k.astype(q.dtype), v.astype(q.dtype), kv_mask, sp_serve_mesh,
                q_offset=cache_len,
            )
        else:
            # Per-slot decode at T=1 passes q_offset=None: the query is the
            # last valid position by construction and kv_mask already bounds
            # each slot at length[b]+1, so the causal offset is redundant.
            # Per-slot T>1 (batched speculative verify) needs the [B]-vector
            # offset for intra-block causality — the XLA paths broadcast it
            # per row (attention() routes vector offsets away from Pallas).
            if cache_kv is None or (per_slot and T == 1):
                qoff = None
            else:
                qoff = cache_len
            out = attention(
                q, k.astype(q.dtype), v.astype(q.dtype),
                causal=causal, kv_mask=kv_mask, impl=attn_impl,
                q_offset=qoff,
            )
        out = out.transpose(0, 2, 1, 3).reshape(B, T, c.q_dim)
        h = h + m["o_proj"](lp["attn"]["o_proj"], out)

        x = m["post_attn_norm"](lp["post_attn_norm"], h)
        if "gate_up_proj" in lp["mlp"]:
            gu = Linear(c.hidden_size, 2 * c.intermediate_size, use_bias=False,
                        param_dtype=c.param_dtype)(lp["mlp"]["gate_up_proj"], x)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = m["gate_proj"](lp["mlp"]["gate_proj"], x)
            up = m["up_proj"](lp["mlp"]["up_proj"], x)
        h = h + m["down_proj"](lp["mlp"]["down_proj"], jax.nn.silu(gate) * up)
        return h, new_cache

    def __call__(
        self,
        params: PyTree,
        *,
        input_ids: Optional[Array] = None,
        inputs_embeds: Optional[Array] = None,
        attention_mask: Optional[Array] = None,  # [B, T_kv] bool/int: valid kv positions
        positions: Optional[Array] = None,  # [B, T] int32
        kv_cache: Optional[KVCache] = None,
        remat: bool = False,
        attn_impl: str = "auto",
        return_hidden: bool = False,
        logits_indices: Optional[Array] = None,  # [B] gather positions before lm_head
    ) -> Tuple[Array, Optional[KVCache]]:
        """Full causal decoder forward.

        Without cache: ``attention_mask`` MUST be a RIGHT-PADDING prefix mask
        ([1]*n + [0]*pad per row). It is used for position computation only —
        no kv mask is applied, because causal masking + right padding already
        prevent any valid query from attending a padded key (padded rows
        compute garbage that IGNORE labels / last-valid gathers never read),
        and dropping it lets the flash kernels run their segment-free causal
        fast path. A left-padded or interior-masked batch would silently
        attend masked keys: a concrete (non-traced) mask is checked eagerly
        below; traced masks rely on the contract (collator, generation, and
        embed_multimodal all right-pad).

        With cache: keys/values are written at ``kv_cache.length`` and
        attention runs over the whole cache buffer with positions >= length+T
        masked out (attention_mask IS applied as a kv mask there).
        """
        c = self.cfg
        if inputs_embeds is None:
            inputs_embeds = self.embed_input_ids(params, input_ids)
        h = self._constrain_h(inputs_embeds.astype(c.compute_dtype))
        B, T, _ = h.shape

        if kv_cache is not None:
            start = kv_cache.length
            max_len = kv_cache.k.shape[3]
            # PER-SLOT lengths (continuous-batching decode): ``length`` may be
            # a [B] vector — each row's sequence occupies cache positions
            # [0, length[b]) and the T new tokens write at
            # length[b]..length[b]+T-1 (a scatter in ``_layer``). T=1 is plain
            # continuous-batching decode; T>1 is the batched speculative
            # verify (per-row causal offsets). Prefill happens per-request at
            # B=1 (scalar length) and is spliced into a slot by the engine.
            per_slot = getattr(start, "ndim", 0) == 1
            start_col = start[:, None] if per_slot else start
            if positions is None:
                positions = jnp.broadcast_to(
                    start_col + jnp.arange(T, dtype=jnp.int32)[None, :], (B, T)
                )
            # kv validity over the cache buffer: pos < start+T, AND (per-batch
            # attention_mask for the written region if provided)
            kv_pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
            kv_mask = kv_pos < (start_col + T)
            kv_mask = jnp.broadcast_to(kv_mask, (B, max_len))
            if attention_mask is not None:
                am = attention_mask.astype(bool)
                if am.shape[1] == max_len:
                    kv_mask = kv_mask & am
                else:
                    pad = jnp.ones((B, max_len - am.shape[1]), bool)
                    kv_mask = kv_mask & jnp.concatenate([am, pad], axis=1)
        else:
            if positions is None:
                if attention_mask is not None:
                    positions = jnp.maximum(jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1, 0)
                else:
                    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
            # Causal self-attention + the decoder's RIGHT-padding contract
            # (collator, generation, embed_multimodal all right-pad; positions
            # above assume it too) make the kv padding mask redundant: query i
            # attends keys j <= i, and every padded key sits after every valid
            # query, so no valid position can attend a pad. Dropping it lets
            # the flash kernels run their segment-free causal fast path.
            # Padded rows compute garbage that loss (IGNORE labels) and logit
            # readers (last-valid gather) never consume.
            if attention_mask is not None and not isinstance(attention_mask, jax.core.Tracer):
                # eager-mode contract check (free: concrete masks only occur in
                # tests/debug paths; jit-traced masks rely on the contract)
                am = np.asarray(attention_mask).astype(bool)
                is_prefix = bool((am[:, 1:] <= am[:, :-1]).all())
                if not is_prefix:  # raise, not assert: must survive python -O
                    raise ValueError(
                        "decoder no-cache forward requires a right-padding prefix "
                        "attention_mask ([1]*n + [0]*pad per row); left-padded or "
                        "interior-masked batches would silently attend masked keys"
                    )
            kv_mask = None

        # Zigzag layout for causal sequence-parallel forwards: permute tokens
        # ONCE for the whole layer stack (per-layer permutes would pay an
        # all-to-all per layer) so each sp shard holds one early + one late
        # chunk, halving per-step ring compute (_ring_local_zigzag). Inverse
        # permute after the stack restores original order for loss/readout.
        # Position-based masking makes this exact under right padding: pad
        # keys keep their late physical indices through the permutation.
        zig_inv = None
        if kv_cache is None and c.sp_zigzag:
            spm = self._sp_mesh(T)
            if spm is not None:
                from merv_tpu.parallel.mesh import SEQ_AXIS as _SP
                nsp = spm.shape[_SP]
                if T % (2 * nsp) == 0:
                    from merv_tpu.ops.ring_attention import zigzag_perm

                    zperm = zigzag_perm(T, nsp)
                    zig_inv = np.argsort(zperm)
                    h = h[:, zperm]
                    positions = positions[:, zperm]

        cos_sin = _rope_tables(c, positions, h.dtype)

        if kv_cache is not None:
            if remat:
                raise ValueError(
                    "remat=True is not supported with a kv_cache: the cached layer "
                    "scan relies on in-place carry aliasing that jax.checkpoint "
                    "recomputation would defeat (training never runs a cache; "
                    "serving never needs remat)"
                )
            # The stacked cache rides the scan CARRY with per-layer indexed
            # writes (a few KB touched in place), NOT xs->ys slices: the
            # xs->ys form made XLA copy the whole cache every step (~1.7 GB
            # read+write at 7B full depth = 2.3 ms of the 12.6 ms/token step).
            def layer_fn(carry, lp):
                h, ck, cv, cks, cvs, idx = carry
                h = constrain_batch_dim(h)
                h, (ck, cv, cks, cvs) = self._layer(
                    lp, h, cos_sin, kv_mask, (ck, cv, cks, cvs), kv_cache.length, True, attn_impl,
                    layer_idx=idx,
                )
                return (h, ck, cv, cks, cvs, idx + 1), None

            # NOTE: do NOT unroll this scan — re-tested after the carry
            # restructure: unroll=2 still collapses 10.84 -> 23.6 ms/token
            # (two indexed cache writes per unrolled body defeat XLA's
            # in-place buffer aliasing, materializing cache copies again).
            # under sp serving, pin the cache buffers' sequence dim to the sp
            # axis at scan entry (GSPMD propagates through the indexed writes)
            from merv_tpu.ops.ring_attention import constrain_cache_seq

            spm = self._sp_serve_mesh(max_len)
            carry0 = (h,
                      constrain_cache_seq(kv_cache.k, spm),
                      constrain_cache_seq(kv_cache.v, spm),
                      constrain_cache_seq(kv_cache.k_scale, spm),
                      constrain_cache_seq(kv_cache.v_scale, spm),
                      jnp.zeros((), jnp.int32))
            (h, ck, cv, cks, cvs, _), _ = jax.lax.scan(layer_fn, carry0, params["layers"])
            new_cache = KVCache(ck, cv, kv_cache.length + T, cks, cvs)
        else:
            pp_mesh = self._pp_mesh(B)
            if pp_mesh is not None:
                # GPipe over the 'pp' axis: stages = layer blocks, microbatched
                # ring of activations + rope tables (parallel/pipeline.py).
                # kv_mask is None on this path by the right-padding contract.
                from merv_tpu.parallel.mesh import PIPE_AXIS
                from merv_tpu.parallel.pipeline import pipeline_layer_scan, resolve_microbatches

                def pp_layer(lp, hh, cs):
                    hh, _ = self._layer(lp, hh, cs, None, None, None, True, attn_impl)
                    return hh

                h = pipeline_layer_scan(
                    pp_layer, h, cos_sin, params["layers"], pp_mesh,
                    microbatches=resolve_microbatches(
                        B, pp_mesh.shape[PIPE_AXIS], self.cfg.pp_microbatches
                    ),
                    remat=remat,
                )
            else:
                def layer_fn(carry, lp):
                    h = self._constrain_h(carry)
                    h, _ = self._layer(
                        lp, h, cos_sin, kv_mask, None, None, True, attn_impl,
                        sp_zigzag=zig_inv is not None,
                    )
                    return h, None

                if remat:
                    layer_fn = jax.checkpoint(layer_fn, prevent_cse=False)
                # No cache writes in this branch, so unrolling is aliasing-safe
                # (unlike the cache-carrying scans above/below, pinned at 1).
                # Remat keeps unroll=1: wider bodies widen remat live-ranges and
                # break the compiler-verified v5e-8 training fit.
                unroll = 1 if remat else self.cfg.scan_unroll
                h, _ = jax.lax.scan(layer_fn, h, params["layers"], unroll=unroll)
                if zig_inv is not None:
                    h = h[:, zig_inv]
            new_cache = None

        m = self._modules()
        h = m["final_norm"](params["final_norm"], h)
        if return_hidden:
            return h, new_cache
        if logits_indices is not None:
            # prefill fast path: project only the requested positions — skips
            # ~T x V x E of lm_head FLOPs when just the next token is needed
            h = jnp.take_along_axis(h, logits_indices[:, None, None], axis=1)
        logits = self.lm_head_apply(params, h)
        return logits, new_cache

    def lm_head_apply(self, params: PyTree, h: Array) -> Array:
        """Final hidden states -> vocabulary logits (tied or untied head)."""
        if self.cfg.tie_word_embeddings:
            return h @ params["embed_tokens"]["embedding"].astype(h.dtype).T
        return self._modules()["lm_head"](params["lm_head"], h)


def pack_serving_params(params: PyTree) -> PyTree:
    """Pack q/k/v (and gate/up) kernels into single stored GEMM weights.

    An inference-time layout transform: [D, q_dim], [D, kv_dim], [D, kv_dim]
    kernels concatenate into one [D, q_dim + 2*kv_dim] kernel (same for
    gate/up -> [D, 2*I]), so the decoder runs one wide MXU GEMM where three
    narrow ones ran. Because the packed kernel is what's STORED, there is no
    per-layer concat in the compiled program — the scanned weights are read
    in place (the trace-time-concat variant regressed; see _layer). Bit-exact:
    GEMM columns are independent, so packed output == concat of separate
    outputs. Apply after checkpoint load, before jit; training params stay
    unpacked (optimizer states key on the unpacked tree).

    Single-chip serving layout: the tensor-parallel rule table
    (parallel/sharding.py) keys on the UNPACKED q/k/v paths — a packed tree
    under a tensor>1 mesh falls back to replicated weights (correct, just not
    sharded). Use ``pack_llm=False`` / unpacked params for TP serving.
    """
    params = dict(params)
    layers = dict(params["layers"])
    attn = dict(layers["attn"])
    mlp = dict(layers["mlp"])
    qkv = {"kernel": jnp.concatenate(
        [attn["q_proj"]["kernel"], attn["k_proj"]["kernel"], attn["v_proj"]["kernel"]], axis=-1
    )}
    if "bias" in attn["q_proj"]:
        qkv["bias"] = jnp.concatenate(
            [attn["q_proj"]["bias"], attn["k_proj"]["bias"], attn["v_proj"]["bias"]], axis=-1
        )
    for k in ("q_proj", "k_proj", "v_proj"):
        del attn[k]
    attn["qkv_proj"] = qkv
    mlp["gate_up_proj"] = {"kernel": jnp.concatenate(
        [mlp["gate_proj"]["kernel"], mlp["up_proj"]["kernel"]], axis=-1
    )}
    for k in ("gate_proj", "up_proj"):
        del mlp[k]
    layers["attn"] = attn
    layers["mlp"] = mlp
    params["layers"] = layers
    return params


# ---------------------------------------------------------------------------
# Registered decoder configs (HF config parity for weight import)
# ---------------------------------------------------------------------------

LLAMA2_7B = DecoderConfig(
    vocab_size=32064,  # 32000 + <PAD> resized to multiple of 64 (reference llama2.py:74-76)
    hidden_size=4096, intermediate_size=11008, num_layers=32,
    num_heads=32, num_kv_heads=32, head_dim=128,
    max_position_embeddings=4096, rope_theta=10000.0, rms_norm_eps=1e-5,
)

LLAMA2_13B = DecoderConfig(
    vocab_size=32064,
    hidden_size=5120, intermediate_size=13824, num_layers=40,
    num_heads=40, num_kv_heads=40, head_dim=128,
    max_position_embeddings=4096, rope_theta=10000.0, rms_norm_eps=1e-5,
)

LLAMA3_8B = DecoderConfig(
    vocab_size=128320,  # 128256 + pad resized to multiple of 64
    hidden_size=4096, intermediate_size=14336, num_layers=32,
    num_heads=32, num_kv_heads=8, head_dim=128,
    max_position_embeddings=8192, rope_theta=500000.0, rms_norm_eps=1e-5,
)

LLAMA31_8B = dataclasses.replace(LLAMA3_8B, vocab_size=128256, max_position_embeddings=131072)

QWEN25_7B = DecoderConfig(
    vocab_size=152064,
    hidden_size=3584, intermediate_size=18944, num_layers=28,
    num_heads=28, num_kv_heads=4, head_dim=128,
    max_position_embeddings=32768, rope_theta=1000000.0, rms_norm_eps=1e-6,
    attention_bias=True,
)

QWEN25_3B = DecoderConfig(
    vocab_size=151936,
    hidden_size=2048, intermediate_size=11008, num_layers=36,
    num_heads=16, num_kv_heads=2, head_dim=128,
    max_position_embeddings=32768, rope_theta=1000000.0, rms_norm_eps=1e-6,
    attention_bias=True, tie_word_embeddings=True,
)


def tiny_decoder_config(**overrides: Any) -> DecoderConfig:
    """Small config for tests/benchmarks."""
    base = dict(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, max_position_embeddings=512,
    )
    base.update(overrides)
    return DecoderConfig(**base)
