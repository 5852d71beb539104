"""Generic functional Vision Transformer covering every MERV tower family.

One configurable encoder replaces four torch implementations the reference
pulls from timm/HF (reference ``merv/models/backbones/video/dinov2_video.py``,
``siglip.py``, ``vivit.py``, ``languagebind/video/modeling_video.py``):

- **DINOv2-reg** (ViT-L/14, cls + 4 register tokens, LayerScale)
- **SigLIP** (ViT-B/16, no cls token, tanh-GELU)
- **CLIP / LanguageBind-Video** (ViT-L/14, pre-LN, QuickGELU, and per-layer
  *temporal attention* over frames — the LanguageBind modification, reference
  ``modeling_video.py:94-186``)
- **ViViT** (3D tubelet embedding 2x16x16 over 32 frames, reference
  ``vivit.py:42-47``)

TPU-native design decisions:
- patch/tubelet embedding is a reshape + single matmul (stride == kernel, so
  the conv is exactly a block reshape) — lands on the MXU as one large GEMM
  instead of a convolution;
- layers run under ``lax.scan`` over stacked parameters (single compiled block);
- attention uses :func:`merv_tpu.ops.attention.attention`;
- the penultimate-layer feature tap (timm ``get_intermediate_layers n={L-2}``,
  HF ``hidden_states[-2]`` — reference ``dinov2_video.py:40-67``,
  ``languagebind/__init__.py:85``) is expressed as "scan the first L-1 layers",
  so the last block's FLOPs are never executed at all.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from merv_tpu.nn.core import ACT2FN, Embed, LayerNorm, Linear, normal_init, trunc_normal_init, zeros_init
from merv_tpu.ops.attention import (
    DEFAULT_MASK_VALUE,
    attention,
    can_use_pallas,
    dispatch_plan,
    packed_temporal_attention,
    small_attention_kt,
)
from merv_tpu.parallel.sharding import constrain_batch_dim

Array = jax.Array
PyTree = Any


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12

    num_cls_tokens: int = 0
    num_register_tokens: int = 0
    # True -> position embedding rows cover [cls?, patches] (facebook DINOv2 /
    # CLIP / ViViT convention). False -> patches only (SigLIP).
    pos_embed_includes_prefix: bool = True

    act: str = "gelu"
    layer_norm_eps: float = 1e-6
    use_layerscale: bool = False        # DINOv2 LayerScale gamma
    pre_norm: bool = False              # CLIP pre_layrnorm after embeddings
    patch_bias: bool = True             # CLIP conv has no bias

    # ViViT: 3D tubelet (t, p, p); input becomes [B, C, T, H, W]
    tubelet_t: int = 0                  # 0 = 2D per-frame model
    tubelet_frames: int = 0             # frames the pos embed covers (ViViT: 32)

    # LanguageBind: per-layer temporal attention over frames
    temporal_attn: bool = False
    temporal_frames: int = 8            # size of the learned temporal embedding

    # timm MAP head (AttentionPoolLatent): latent-probe cross-attention pooling.
    # SigLIP's pooled variants use it via timm's default forward (reference
    # siglip.py:47-58 keeps class_token=True -> featurizer() returns the
    # pooled embedding, one token per frame).
    attn_pool: bool = False
    attn_pool_heads: int = 12
    attn_pool_mlp_ratio: float = 4.0
    attn_pool_act: str = "gelu"         # timm MAP head uses exact GELU; HF's
    #                                     SiglipMultiheadAttentionPoolingHead
    #                                     (same math) uses gelu_tanh

    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    # lax.scan unroll factor for the layer stack: unrolling lets XLA overlap
    # the next layer's weight fetch with the current layer's GEMMs. Measured
    # headline (videos/sec): 5.88 (1) / 5.94 (4) / 5.99 (8) / 6.15 (12) /
    # 6.15 (24 = full ViT-L) -- 12 is the plateau. Towers have no
    # cache-aliasing constraint so unrolling is safe (contrast the decoder,
    # where unroll>1 collapsed decode -- BASELINE.md negative results).
    scan_unroll: int = 12

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        n = self.grid_size * self.grid_size
        if self.tubelet_t:
            n *= self.tubelet_frames // self.tubelet_t
        return n

    @property
    def num_prefix_tokens(self) -> int:
        return self.num_cls_tokens + self.num_register_tokens

    @property
    def seq_len(self) -> int:
        return self.num_prefix_tokens + self.num_patches

    @property
    def pos_embed_len(self) -> int:
        return self.num_patches + (self.num_cls_tokens if self.pos_embed_includes_prefix else 0)


@dataclass(frozen=True)
class VisionTransformer:
    cfg: ViTConfig

    # -- init ------------------------------------------------------------------------

    def init(self, key: Array) -> PyTree:
        c = self.cfg
        keys = jax.random.split(key, 8 + c.num_layers)
        patch_in = (c.tubelet_t if c.tubelet_t else 1) * c.patch_size * c.patch_size * 3

        init02 = trunc_normal_init(0.02)
        lin = lambda i, o, b=True: Linear(i, o, use_bias=b, param_dtype=c.param_dtype, kernel_init=init02)  # noqa: E731
        ln = LayerNorm(c.hidden_size, eps=c.layer_norm_eps, param_dtype=c.param_dtype)

        def layer_params(k: Array) -> PyTree:
            ks = jax.random.split(k, 8)
            p: Dict[str, Any] = {
                "norm1": ln.init(ks[0]),
                "attn": {
                    "q_proj": lin(c.hidden_size, c.hidden_size).init(ks[1]),
                    "k_proj": lin(c.hidden_size, c.hidden_size).init(ks[2]),
                    "v_proj": lin(c.hidden_size, c.hidden_size).init(ks[3]),
                    "o_proj": lin(c.hidden_size, c.hidden_size).init(ks[4]),
                },
                "norm2": ln.init(ks[0]),
                "mlp": {
                    "fc1": lin(c.hidden_size, c.intermediate_size).init(ks[5]),
                    "fc2": lin(c.intermediate_size, c.hidden_size).init(ks[6]),
                },
            }
            if c.use_layerscale:
                p["ls1"] = {"gamma": jnp.full((c.hidden_size,), 1e-5, c.param_dtype)}
                p["ls2"] = {"gamma": jnp.full((c.hidden_size,), 1e-5, c.param_dtype)}
            if c.temporal_attn:
                p["temporal_embedding"] = normal_init(c.hidden_size ** -0.5)(
                    ks[7], (c.temporal_frames, c.hidden_size), c.param_dtype
                )
                p["t_norm"] = ln.init(ks[0])
                p["t_attn"] = {
                    "q_proj": lin(c.hidden_size, c.hidden_size).init(ks[1]),
                    "k_proj": lin(c.hidden_size, c.hidden_size).init(ks[2]),
                    "v_proj": lin(c.hidden_size, c.hidden_size).init(ks[3]),
                    "o_proj": lin(c.hidden_size, c.hidden_size).init(ks[4]),
                }
            return p

        layers = jax.vmap(layer_params)(keys[8 : 8 + c.num_layers])
        params: Dict[str, Any] = {
            "patch_embed": {"kernel": init02(keys[0], (patch_in, c.hidden_size), c.param_dtype)},
            "pos_embed": init02(keys[1], (c.pos_embed_len, c.hidden_size), c.param_dtype),
            "layers": layers,
            "final_norm": ln.init(keys[2]),
        }
        if c.patch_bias:
            params["patch_embed"]["bias"] = zeros_init(keys[0], (c.hidden_size,), c.param_dtype)
        if c.num_cls_tokens:
            params["cls_token"] = init02(keys[3], (c.num_cls_tokens, c.hidden_size), c.param_dtype)
        if c.num_register_tokens:
            params["register_tokens"] = init02(keys[4], (c.num_register_tokens, c.hidden_size), c.param_dtype)
        if c.pre_norm:
            params["pre_norm"] = ln.init(keys[5])
        if c.attn_pool:
            hidden = int(c.hidden_size * c.attn_pool_mlp_ratio)
            pk = jax.random.split(keys[6], 7)
            params["attn_pool"] = {
                "latent": init02(pk[0], (1, c.hidden_size), c.param_dtype),
                "q": lin(c.hidden_size, c.hidden_size).init(pk[1]),
                "kv": lin(c.hidden_size, 2 * c.hidden_size).init(pk[2]),
                "proj": lin(c.hidden_size, c.hidden_size).init(pk[3]),
                "norm": ln.init(pk[4]),
                "mlp": {
                    "fc1": lin(c.hidden_size, hidden).init(pk[5]),
                    "fc2": lin(hidden, c.hidden_size).init(pk[6]),
                },
            }
        return params

    # -- embedding -------------------------------------------------------------------

    def _patchify_2d(self, params: PyTree, pixels: Array) -> Array:
        """[B, C, H, W] -> [B, N, D] via reshape + matmul (== stride-p conv)."""
        c = self.cfg
        B, C, H, W = pixels.shape
        g, p = H // c.patch_size, c.patch_size
        x = pixels.reshape(B, C, g, p, g, p)
        # -> [B, gh, gw, p, p, C]: match conv kernel layout (out = patch . W[C,p,p])
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(B, g * g, p * p * C)
        kernel = params["patch_embed"]["kernel"].astype(x.dtype)
        out = x @ kernel
        if c.patch_bias:
            out = out + params["patch_embed"]["bias"].astype(x.dtype)
        return out

    def _patchify_3d(self, params: PyTree, pixels: Array) -> Array:
        """[B, C, T, H, W] -> [B, N, D] tubelet embedding."""
        c = self.cfg
        B, C, T, H, W = pixels.shape
        t, p = c.tubelet_t, c.patch_size
        g = H // p
        x = pixels.reshape(B, C, T // t, t, g, p, g, p)
        # -> [B, T/t, gh, gw, t, p, p, C]
        x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1).reshape(B, (T // t) * g * g, t * p * p * C)
        kernel = params["patch_embed"]["kernel"].astype(x.dtype)
        out = x @ kernel
        if c.patch_bias:
            out = out + params["patch_embed"]["bias"].astype(x.dtype)
        return out

    def embed(self, params: PyTree, pixels: Array) -> Array:
        """pixels: [B, C, H, W] (2D) or [B, C, T, H, W] (tubelet) -> [B, S, D]."""
        c = self.cfg
        x = self._patchify_3d(params, pixels) if c.tubelet_t else self._patchify_2d(params, pixels)
        B = x.shape[0]
        pos = params["pos_embed"].astype(x.dtype)

        prefix = []
        if c.num_cls_tokens:
            cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, c.num_cls_tokens, c.hidden_size))
            if c.pos_embed_includes_prefix:
                cls = cls + pos[None, : c.num_cls_tokens]
                x = x + pos[None, c.num_cls_tokens :]
            else:
                x = x + pos[None]
            prefix.append(cls)
        else:
            x = x + pos[None]
        if c.num_register_tokens:
            regs = jnp.broadcast_to(
                params["register_tokens"].astype(x.dtype), (B, c.num_register_tokens, c.hidden_size)
            )
            prefix.append(regs)
        if prefix:
            x = jnp.concatenate(prefix + [x], axis=1)
        return x

    # -- transformer -----------------------------------------------------------------

    def _mha(self, lp: PyTree, x: Array) -> Array:
        # NOTE: packing q/k/v into one [D, 3D] GEMM measured NEUTRAL here and
        # a regression in the LLM (the concat re-materializes scanned weights
        # every layer — see transformer.py:_layer). Separate GEMMs read the
        # stacked weights in place; measured on v5e 2026-08.
        import os

        c = self.cfg
        B, S, D = x.shape
        H, Dh = c.num_heads, c.head_dim

        plan = dispatch_plan(
            S, S, Dh, causal=False, has_bias=False, has_q_offset=False,
            on_tpu=can_use_pallas(), self_shaped=True,
        )
        # experiment override for the tower-attention gap hunt (BASELINE.md
        # round-4): "small" pins the Pallas kernel, "xla_kt" the pure-XLA
        # softmax chain on the same transpose-free kt layout, "xla" the plain
        # linear+transpose XLA path
        plan = os.environ.get("MERV_TPU_TOWER_ATTN", plan)
        if plan in ("small", "xla_kt"):
            # TRANSPOSE-FREE path: the projection einsums write q/v directly
            # in [B, H, S, Dh] and k in [B, H, Dh, S] (the GEMM's output
            # layout carries the head split), and the kt-kernel consumes k
            # without Mosaic's in-cell lane<->sublane shuffle. The explicit
            # [B,S,H,Dh]<->[B,H,S,Dh] transposes this replaces ran at ~25% of
            # HBM bandwidth and cost ~0.4 ms/layer across the 24-layer towers
            # (measured v5e 2026-08-17; see BASELINE.md round-3 tower profile).
            def proj(p, eq, bshape):
                y = jnp.einsum(eq, x, p["kernel"].astype(x.dtype).reshape(D, H, Dh))
                if "bias" in p:
                    y = y + p["bias"].reshape(bshape).astype(x.dtype)
                return y

            q = proj(lp["q_proj"], "bsd,dhk->bhsk", (H, 1, Dh))
            kt = proj(lp["k_proj"], "bsd,dhk->bhks", (H, Dh, 1))
            v = proj(lp["v_proj"], "bsd,dhk->bhsk", (H, 1, Dh))
            if plan == "xla_kt":
                # pure-XLA softmax chain on the same layout: no pallas_call
                # boundary, XLA free to fuse with neighbors
                s = jnp.einsum("bhqd,bhdk->bhqk", q, kt,
                               preferred_element_type=jnp.float32) * (Dh ** -0.5)
                p = jax.nn.softmax(s, axis=-1)
                out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
            else:
                out = small_attention_kt(q, kt, v, Dh ** -0.5)
            y = jnp.einsum("bhsk,hkd->bsd", out, lp["o_proj"]["kernel"].astype(x.dtype).reshape(H, Dh, D))
            if "bias" in lp["o_proj"]:
                y = y + lp["o_proj"]["bias"].astype(x.dtype)
            return y

        lin = Linear(D, D, param_dtype=c.param_dtype)
        q = lin(lp["q_proj"], x).reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        k = lin(lp["k_proj"], x).reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        v = lin(lp["v_proj"], x).reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        out = attention(q, k, v, causal=False)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        return lin(lp["o_proj"], out)

    def _mha_time_packed(self, lp: PyTree, x: Array) -> Array:
        """MHA over a TINY sequence (the temporal frame axis), MXU-packed.

        Plain batched attention at [B*N, H, F, F] (F = 8 frames) runs ~131k
        [F, d]x[d, F] matmuls per layer at ~1% MXU utilization — measured
        ~30 ms of the 75 ms LanguageBind tower. Packing all H heads' F-frame
        windows into ONE sequence of H*F = 128 rows with a block-diagonal
        mask turns that into [B*N, 128, 128] full-tile MXU work (the off-
        diagonal blocks are wasted FLOPs, but tiny compared to the
        utilization win). Identical math to per-head attention: each
        (head, frame) query row sees exactly its own head's F keys.
        """
        c = self.cfg
        Bn, F, Dm = x.shape
        H, dh = c.num_heads, c.head_dim
        R = F * H
        # Fused-kernel path, OFF by default after on-chip A/B (2026-08-19,
        # BASELINE.md negative results): packed_temporal_attention keeps
        # scores + the interleaved-head mask + softmax in VMEM instead of the
        # XLA form's [Bn, R, R] f32 score+bias HBM round-trip, but the WHOLE
        # LanguageBind tower measured 75.2 ms with it vs 65.05 ms on the XLA
        # path — at [514, 256, 256] XLA's bias formulation fuses better than
        # the hand kernel (second kernel attempt to lose here; see also the
        # round-3 block-diagonal kernel). Kept opt-in for re-measurement on
        # future hardware: MERV_TPU_TEMPORAL_KERNEL=1.
        use_kernel = os.environ.get("MERV_TPU_TEMPORAL_KERNEL", "0") == "1"
        if use_kernel and can_use_pallas() and R % 128 == 0 and dh % 16 == 0:
            def proj(p, eq, bshape):
                y = jnp.einsum(eq, x, p["kernel"].astype(x.dtype).reshape(Dm, H, dh))
                if "bias" in p:
                    y = y + p["bias"].reshape(bshape).astype(x.dtype)
                return y

            q = proj(lp["q_proj"], "bfd,dhk->bfhk", (1, H, dh)).reshape(Bn, R, dh)
            kt = proj(lp["k_proj"], "bfd,dhk->bkfh", (dh, 1, H)).reshape(Bn, dh, R)
            v = proj(lp["v_proj"], "bfd,dhk->bfhk", (1, H, dh)).reshape(Bn, R, dh)
            out = packed_temporal_attention(q, kt, v, dh ** -0.5, H)
            out = out.reshape(Bn, F, Dm)
            return Linear(Dm, Dm, param_dtype=c.param_dtype)(lp["o_proj"], out)

        lin = Linear(Dm, Dm, param_dtype=c.param_dtype)
        # FRAME-major packed rows [Bn, 1, F*H, dh]: a pure reshape of the
        # projection output ([Bn, F, Dm] -> rows (f, h)) — no head transpose
        # in, and the output reshape back to [Bn, F, Dm] is head-major concat
        # per frame, exactly o_proj's expected layout. Fully transpose-free.
        q = lin(lp["q_proj"], x).reshape(Bn, 1, F * H, dh)
        k = lin(lp["k_proj"], x).reshape(Bn, 1, F * H, dh)
        v = lin(lp["v_proj"], x).reshape(Bn, 1, F * H, dh)
        # row r = f*H + h: same-head pairs are r % H == r' % H
        row_head = jax.lax.broadcasted_iota(jnp.int32, (F * H, F * H), 0) % H
        col_head = jax.lax.broadcasted_iota(jnp.int32, (F * H, F * H), 1) % H
        bias = jnp.where(row_head == col_head, 0.0, DEFAULT_MASK_VALUE)[None, None]
        out = attention(q, k, v, causal=False, bias=bias)
        out = out.reshape(Bn, F, Dm)
        return lin(lp["o_proj"], out)

    def _layer(self, lp: PyTree, x: Array, frames: int) -> Array:
        c = self.cfg
        ln = LayerNorm(c.hidden_size, eps=c.layer_norm_eps, param_dtype=c.param_dtype)
        act = ACT2FN[c.act]

        if c.temporal_attn and frames > 1:
            # x: [(B*T), N, D] — temporal embedding + attention over the frame axis
            BT, N, D = x.shape
            B = BT // frames
            xt = x.reshape(B, frames, N, D)
            xt = xt + lp["temporal_embedding"][None, :frames, None, :].astype(x.dtype)
            xt = xt.transpose(0, 2, 1, 3).reshape(B * N, frames, D)  # [(B*N), T, D]
            xt_n = ln(lp["t_norm"], xt)
            if frames * c.num_heads <= 512:
                yt = self._mha_time_packed(lp["t_attn"], xt_n)
            else:
                yt = self._mha(lp["t_attn"], xt_n)
            xt = xt + yt
            x = xt.reshape(B, N, frames, D).transpose(0, 2, 1, 3).reshape(BT, N, D)

        # Whole-layer fused attention block (round-5 BASELINE.md experiment):
        # LN1 + qkv + attention + o-proj + LayerScale + residual as ONE Pallas
        # program — the exact form round-4 named as the only remaining closer
        # for the pinned ~12 ms/tower-above-GEMM-floor. Opt-in for the A/B
        # (scripts/bench_tower_attn.py --impl fused_block).
        if (
            os.environ.get("MERV_TPU_FUSED_VIT_BLOCK", "0") == "1"
            and can_use_pallas()
            and c.hidden_size % 128 == 0
            and "bias" in lp["attn"]["q_proj"]
        ):
            from merv_tpu.ops.fused_vit_block import fused_vit_attn_block

            ap = lp["attn"]
            D = c.hidden_size
            gamma = (
                lp["ls1"]["gamma"] if c.use_layerscale
                else jnp.ones((D,), c.param_dtype)
            )
            x = fused_vit_attn_block(
                x,
                lp["norm1"]["scale"], lp["norm1"]["bias"],
                ap["q_proj"]["kernel"].astype(x.dtype), ap["q_proj"]["bias"],
                ap["k_proj"]["kernel"].astype(x.dtype), ap["k_proj"]["bias"],
                ap["v_proj"]["kernel"].astype(x.dtype), ap["v_proj"]["bias"],
                ap["o_proj"]["kernel"].astype(x.dtype), ap["o_proj"]["bias"],
                gamma, c.num_heads, c.layer_norm_eps,
            )
        else:
            x = x + self._ls(lp, "ls1", self._mha(lp["attn"], ln(lp["norm1"], x)))
        h = ln(lp["norm2"], x)
        h = Linear(c.hidden_size, c.intermediate_size, param_dtype=c.param_dtype)(lp["mlp"]["fc1"], h)
        h = act(h)
        h = Linear(c.intermediate_size, c.hidden_size, param_dtype=c.param_dtype)(lp["mlp"]["fc2"], h)
        return x + self._ls(lp, "ls2", h)

    def _ls(self, lp: PyTree, name: str, x: Array) -> Array:
        if self.cfg.use_layerscale:
            return x * lp[name]["gamma"].astype(x.dtype)
        return x

    def _attn_pool(self, pp: PyTree, x: Array) -> Array:
        """timm AttentionPoolLatent (pool_type='token', latent_len=1):
        latent probe -> q; tokens -> packed kv; SDPA; proj; x + mlp(norm(x));
        take the single latent token. [B, N, D] -> [B, D]."""
        c = self.cfg
        B, N, D = x.shape
        H = c.attn_pool_heads
        hd = D // H
        lin = Linear(D, D, param_dtype=c.param_dtype)
        latent = jnp.broadcast_to(pp["latent"].astype(x.dtype), (B, 1, D))
        q = lin(pp["q"], latent).reshape(B, 1, H, hd).transpose(0, 2, 1, 3)
        kv = Linear(D, 2 * D, param_dtype=c.param_dtype)(pp["kv"], x).reshape(B, N, 2, H, hd)
        k = kv[:, :, 0].transpose(0, 2, 1, 3)
        v = kv[:, :, 1].transpose(0, 2, 1, 3)
        out = attention(q, k, v, causal=False)
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, D)
        out = lin(pp["proj"], out)
        ln = LayerNorm(D, eps=c.layer_norm_eps, param_dtype=c.param_dtype)
        h = ln(pp["norm"], out)
        hidden = int(D * c.attn_pool_mlp_ratio)
        h = Linear(D, hidden, param_dtype=c.param_dtype)(pp["mlp"]["fc1"], h)
        h = ACT2FN[c.attn_pool_act](h)
        h = Linear(hidden, D, param_dtype=c.param_dtype)(pp["mlp"]["fc2"], h)
        out = out + h
        return out[:, 0]

    def __call__(
        self,
        params: PyTree,
        pixels: Array,
        *,
        skip_last_layers: int = 0,
        apply_final_norm: bool = False,
        frames: int = 1,
        apply_attn_pool: bool = False,
    ) -> Array:
        """Encode pixels to token features.

        skip_last_layers=1 + apply_final_norm=False reproduces the reference's
        penultimate-layer tap; 0 + True is the HF last_hidden_state contract.
        apply_attn_pool=True (requires cfg.attn_pool, full depth + final norm)
        returns the MAP-head pooled embedding [B, D] — timm's default SigLIP
        forward, used by the reference's pooled variants (siglip.py:47-58).
        """
        c = self.cfg
        x = self.embed(params, pixels.astype(c.compute_dtype))
        if c.pre_norm:
            x = LayerNorm(c.hidden_size, eps=c.layer_norm_eps, param_dtype=c.param_dtype)(params["pre_norm"], x)

        n_run = c.num_layers - skip_last_layers
        layers = jax.tree_util.tree_map(lambda p: p[:n_run], params["layers"])

        def body(h, lp):
            h = constrain_batch_dim(h)
            return self._layer(lp, h, frames), None

        x, _ = jax.lax.scan(body, x, layers, unroll=c.scan_unroll)
        if apply_final_norm or apply_attn_pool:
            x = LayerNorm(c.hidden_size, eps=c.layer_norm_eps, param_dtype=c.param_dtype)(params["final_norm"], x)
        if apply_attn_pool:
            assert c.attn_pool and skip_last_layers == 0, "attn_pool runs on full-depth normed features"
            x = self._attn_pool(params["attn_pool"], x)
        return x


# ---------------------------------------------------------------------------
# Tower configs (weights from timm/HF checkpoints, see vision_import.py)
# ---------------------------------------------------------------------------

# timm vit_large_patch14_reg4_dinov2.lvd142m @ 224px (reference dinov2_video.py:21)
DINOV2_LARGE_REG4 = ViTConfig(
    image_size=224, patch_size=14, hidden_size=1024, intermediate_size=4096,
    num_layers=24, num_heads=16, num_cls_tokens=1, num_register_tokens=4,
    pos_embed_includes_prefix=True, act="gelu", layer_norm_eps=1e-6,
    use_layerscale=True,
)

# timm vit_base_patch16_siglip_224 (reference siglip.py:20)
SIGLIP_BASE_224 = ViTConfig(
    image_size=224, patch_size=16, hidden_size=768, intermediate_size=3072,
    num_layers=12, num_heads=12, num_cls_tokens=0,
    pos_embed_includes_prefix=False, act="gelu_tanh", layer_norm_eps=1e-6,
)

SIGLIP_SO400M_224 = ViTConfig(
    image_size=224, patch_size=14, hidden_size=1152, intermediate_size=4304,
    num_layers=27, num_heads=16, num_cls_tokens=0,
    pos_embed_includes_prefix=False, act="gelu_tanh", layer_norm_eps=1e-6,
)

# LanguageBind/LanguageBind_Video_merge vision tower: CLIP ViT-L/14 + per-layer
# temporal attention over 8 frames (reference languagebind/video/modeling_video.py)
LANGUAGEBIND_VIDEO_LARGE = ViTConfig(
    image_size=224, patch_size=14, hidden_size=1024, intermediate_size=4096,
    num_layers=24, num_heads=16, num_cls_tokens=1,
    pos_embed_includes_prefix=True, act="quick_gelu", layer_norm_eps=1e-5,
    pre_norm=True, patch_bias=False, temporal_attn=True, temporal_frames=8,
)

# google/vivit-b-16x2-kinetics400 (reference vivit.py:16)
VIVIT_BASE_16x2 = ViTConfig(
    image_size=224, patch_size=16, hidden_size=768, intermediate_size=3072,
    num_layers=12, num_heads=12, num_cls_tokens=1,
    pos_embed_includes_prefix=True, act="gelu_tanh", layer_norm_eps=1e-6,
    tubelet_t=2, tubelet_frames=32,
)


def tiny_vit_config(**overrides: Any) -> ViTConfig:
    base = dict(
        image_size=32, patch_size=8, hidden_size=64, intermediate_size=128,
        num_layers=3, num_heads=4, compute_dtype=jnp.float32,
    )
    base.update(overrides)
    return ViTConfig(**base)
