"""MERV: the multi-encoder video-language model.

Behavior parity with the reference MERV (reference
``merv/models/vidlms/merv.py:56-830``), re-architected functionally for TPU:

- **arch_specifier grammar** (``{,no-align}+{avg,attntv,conv,3davg,3dconv}
  {,frame{N}}+{linear,gelu-mlp,fused-gelu-mlp,none}``) selects per-encoder
  projector modules exactly as the reference (``merv.py:89-176``), including
  the ``frame{N}`` temporal-downsample factor and the projector
  token-consistency asserts (``:174-207``).
- **feature fusion** dispatch: ``first`` / ``concat`` / ``concat_channel`` /
  ``concat_channel_ln`` / ``cross_attention_avg_lq`` (+ other
  ``cross_attention*`` variants) / ``scalar`` / ``query_mlp``
  (``merv.py:211-227,599-612``).
- **multimodal splice**: visual tokens inserted after BOS
  (``bos_token_length`` is 0 for qwen2.5 — ``merv.py:521,633-650``), visual
  labels = IGNORE_INDEX (``:652-664``), unimodal rows padded with
  zero-embeddings / False mask / IGNORE labels (``:666-719``).

TPU-native differences:
- ``forward`` is a pure function over a parameter pytree; the whole
  N-encoder -> projectors -> fusion -> LLM graph traces into ONE XLA program
  (the reference runs each encoder as a separate CUDA module call).
- dynamic ``multimodal_indices`` gathers become a static-shape per-row select:
  both the spliced and the end-padded streams are formed and ``jnp.where``
  picks per row — no data-dependent shapes, so the program never re-traces.
- stage freezing produces an optax mask pytree instead of ``requires_grad_``
  flips; frozen video towers additionally get ``stop_gradient`` so XLA prunes
  their backward graph entirely.
- projector/fusion init is seeded by ``PRNGKey(video_backbones[0].embed_dim)``
  mirroring the reference's ``torch.manual_seed(embed_dim)`` reproducibility
  contract (``merv.py:87``).
"""

from __future__ import annotations

import math
import os
import re
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from merv_tpu.models.backbones.llm.base_llm import LLMBackbone
from merv_tpu.models.backbones.video.base_video import VideoBackbone
from merv_tpu.models.generation import GenerationConfig, generate as _generate
from merv_tpu.models.vidlms.base_vidlm import IGNORE_INDEX, VidLM
from merv_tpu.nn.core import LayerNorm, Module
from merv_tpu.nn.fusion import CrossAttentionAdapterLearnableQuery, ScalarAdapter
from merv_tpu.nn.projectors import (
    AttentivePooler,
    AveragePooling3DProjector,
    AveragePoolingProjector,
    Convolutional3DProjector,
    ConvolutionalProjector,
    FusedMLPProjector,
    Identity,
    LinearProjector,
    MLPProjector,
)
from merv_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)

Array = jax.Array
PyTree = Any


def _load_media(video, num_frames_max: int, **clip_kwargs):
    """Path -> uint8 [T, H, W, C]: videos via load_video; ``.jpg`` images
    inflated to a repeated-frame video exactly like the reference
    (``merv.py:787-793`` checks ``".jpg" in video``; we also accept the
    obvious siblings .jpeg/.png, which the reference's eval data never uses
    but its frame-dir loaders produce)."""
    import numpy as np

    path = str(video)
    # route by the actual file EXTENSION, not a substring ('clip.jpg.mp4' or
    # a dir named 'frames.png_v1' must stay on the video path)
    if Path(path).suffix.lower() in (".jpg", ".jpeg", ".png"):
        from PIL import Image

        image = np.asarray(Image.open(path).convert("RGB"))
        return np.repeat(image[None], num_frames_max, axis=0)
    from merv_tpu.preprocessing import load_video

    return load_video(path, num_frames_max, **clip_kwargs)


def _extract_frame_number(query: str) -> int:
    return int(re.search(r"frame(\d+)", query).group(1))


class MERV(VidLM):
    def __init__(
        self,
        model_id: str,
        video_backbones: List[VideoBackbone],
        llm_backbone: LLMBackbone,
        enable_mixed_precision_training: bool = True,
        arch_specifier: str = "gelu-mlp",
        feature_fusion: Optional[str] = None,
        projector_token_length: int = 64,
        visual_feature_length: int = 512,
        pre_proj_layernorm: bool = False,
        text_embedding_dim: int = 3072,
    ) -> None:
        super().__init__(
            "merv", model_id, video_backbones, llm_backbone,
            enable_mixed_precision_training=enable_mixed_precision_training,
        )
        self.feature_fusion_type = feature_fusion
        self.pre_proj_layernorm = pre_proj_layernorm
        self.text_embedding_dim = text_embedding_dim
        self.arch_specifier = arch_specifier
        llm_dim = llm_backbone.embed_dim

        # --- projector selection (reference merv.py:89-176) ---------------------
        if arch_specifier.endswith("linear"):
            mlp_type = "linear"
        elif arch_specifier.endswith("fused-gelu-mlp"):
            mlp_type = "fused-gelu-mlp"
        elif arch_specifier.endswith("gelu-mlp"):
            mlp_type = "gelu-mlp"
        elif arch_specifier.endswith("none"):
            mlp_type = "none"
        else:
            raise ValueError(f"MERV with arch_specifier = {arch_specifier!r} is not supported!")

        parts = arch_specifier.split("+")
        factor = _extract_frame_number(arch_specifier) if "frame" in arch_specifier else 1
        projector_output_size = int(math.isqrt(projector_token_length))
        assert projector_token_length == projector_output_size**2, "projector_token_length should be square number"

        self.tokens_resampled = True
        resampler = next((p for p in ("avg", "attntv", "conv", "3davg", "3dconv") if p in parts), None)

        def make_resampler(vb: VideoBackbone) -> Module:
            # frame{N} downsampling applies to the 3D resamplers only
            # (reference merv.py:136-147)
            out_frames = vb.temporal_resolution // (factor if resampler in ("3davg", "3dconv") else 1)
            if resampler == "avg":
                return AveragePoolingProjector(vb.embed_dim, llm_dim, projector_output_size, out_frames, mlp_type)
            if resampler == "attntv":
                return AttentivePooler(vb.embed_dim, llm_dim, projector_token_length, 8, out_frames, mlp_type)
            if resampler == "conv":
                return ConvolutionalProjector(vb.embed_dim, llm_dim, projector_output_size, 3, out_frames, mlp_type)
            if resampler == "3davg":
                return AveragePooling3DProjector(vb.embed_dim, llm_dim, out_frames, projector_output_size, mlp_type)
            if resampler == "3dconv":
                return Convolutional3DProjector(vb.embed_dim, llm_dim, out_frames, projector_output_size, mlp_type)
            raise AssertionError(resampler)

        if resampler is not None:
            self.projectors: List[Module] = [make_resampler(vb) for vb in video_backbones]
        else:
            self.tokens_resampled = False
            proj_cls = {
                "linear": LinearProjector, "gelu-mlp": MLPProjector, "fused-gelu-mlp": FusedMLPProjector,
            }.get(mlp_type)
            if proj_cls is None:
                self.projectors = [Identity() for _ in video_backbones]
            else:
                self.projectors = [
                    proj_cls(vb.embed_dim, llm_dim, pre_proj_layernorm=pre_proj_layernorm)
                    for vb in video_backbones
                ]

        # --- token-length consistency (reference merv.py:174-207) ---------------
        if len(video_backbones) > 1:
            if self.tokens_resampled:
                assert all(
                    p.output_token_length * p.output_frame_length in (1, visual_feature_length)
                    for p in self.projectors
                ), (
                    "Output token length is not consistent across all projectors!"
                    f" visual_feature_length={visual_feature_length}."
                    f" {[(type(p).__name__, p.output_token_length, 'X', p.output_frame_length) for p in self.projectors]}"
                )
            else:
                assert all(
                    p.output_token_length * vb.temporal_resolution in (1, visual_feature_length)
                    for p, vb in zip(self.projectors, video_backbones)
                ), "Output token length is not consistent across all projectors!"
        else:
            if self.tokens_resampled:
                correct = self.projectors[0].output_token_length * self.projectors[0].output_frame_length
            else:
                correct = video_backbones[0].num_patches
            if correct != visual_feature_length:
                overwatch.info(
                    f"Visual feature length {visual_feature_length} is not consistent "
                    f"with the output token length of the projector! Changing to {correct}",
                    ctx_level=1,
                )
                visual_feature_length = correct
        self.visual_feature_length = visual_feature_length
        self.projector_token_length = projector_token_length

        # --- fusion module (reference merv.py:211-227) ---------------------------
        E = len(video_backbones)
        self.feature_fusion: Optional[Module]
        if feature_fusion == "query_mlp":
            self.feature_fusion = MLPProjector(text_embedding_dim, E)
        elif feature_fusion is not None and "cross_attention" in feature_fusion:
            self.feature_fusion = CrossAttentionAdapterLearnableQuery(
                embed_dim=text_embedding_dim, llm_dim=llm_dim, token_length=visual_feature_length,
                averagetoken="avg" in feature_fusion, num_encoder=E,
                positional_embedding="pe" in feature_fusion,
            )
        elif feature_fusion == "concat_channel":
            self.feature_fusion = LinearProjector(E * llm_dim, llm_dim)
        elif feature_fusion == "concat_channel_ln":
            self.feature_fusion = LinearProjector(E * llm_dim, llm_dim, pre_proj_layernorm=True)
        elif feature_fusion == "scalar":
            self.feature_fusion = ScalarAdapter(E)
        else:
            self.feature_fusion = None

        self.video_backbone_requires_grad = False

        # MCQ likelihood readout tokens (reference merv.py:239-244); resolved
        # lazily so model construction never forces tokenizer instantiation.
        self._string2idx: Optional[Dict[str, int]] = None

    # ------------------------------------------------------------------------------
    # Parameters
    # ------------------------------------------------------------------------------

    @property
    def string2idx(self) -> Dict[str, int]:
        if self._string2idx is None:
            s2i = {}
            tok = self.llm_backbone.tokenizer
            for s in ["True", "False", "Yes", "No"] + [chr(ord("A") + i) for i in range(26)]:
                ids = tok.encode(s, add_special_tokens=False)
                assert len(ids) == 1, f'String "{s}" is tokenized as more than one token!'
                s2i[s] = ids[0]
            self._string2idx = s2i
        return self._string2idx

    def init_projector_params(self, key: Optional[Array] = None) -> PyTree:
        """Projectors + fusion, seeded for reproducibility (reference merv.py:87)."""
        if key is None:
            key = jax.random.PRNGKey(self.video_backbones[0].embed_dim)
        keys = jax.random.split(key, len(self.projectors) + 1)
        params: Dict[str, Any] = {
            "projectors": {str(i): p.init(k) for i, (p, k) in enumerate(zip(self.projectors, keys[:-1]))},
        }
        params["feature_fusion"] = self.feature_fusion.init(keys[-1]) if self.feature_fusion is not None else {}
        return params

    def init(self, key: Array) -> PyTree:
        """Full random-init parameter tree (tests / from-scratch)."""
        kl, kv = jax.random.split(key)
        vkeys = jax.random.split(kv, len(self.video_backbones))
        params = self.init_projector_params()
        params["llm_backbone"] = self.llm_backbone.init(kl)
        params["video_backbones"] = {
            str(i): vb.init(k) for i, (vb, k) in enumerate(zip(self.video_backbones, vkeys))
        }
        return params

    # ------------------------------------------------------------------------------
    # Forward pieces (each pure; compose under jit)
    # ------------------------------------------------------------------------------

    def encode_videos(
        self,
        params: PyTree,
        video_values: Sequence[Array],
        is_image: Optional[Array] = None,
    ) -> List[Array]:
        """Run every tower -> list of [B, num_patches_i, embed_dim_i]."""
        feats = []
        for i, vb in enumerate(self.video_backbones):
            f = vb(params["video_backbones"][str(i)], video_values[i], is_image)
            if not self.video_backbone_requires_grad:
                f = jax.lax.stop_gradient(f)
            feats.append(f)
        return feats

    def project_and_fuse(self, params: PyTree, video_features: Sequence[Array]) -> Tuple[Array, Optional[Array]]:
        """Per-encoder projection + fusion -> ([B, V, llm_dim], mixer weights)."""
        feats = list(video_features)
        if self.tokens_resampled:
            feats = [
                f.reshape(f.shape[0], vb.temporal_resolution, vb.spatial_resolution, f.shape[-1])
                for f, vb in zip(feats, self.video_backbones)
            ]
        projected = [p(params["projectors"][str(i)], f) for i, (p, f) in enumerate(zip(self.projectors, feats))]

        ff = self.feature_fusion_type
        mixer = None
        if ff == "first" or ff is None:
            fused = projected[0]
        elif ff == "concat":
            fused = jnp.concatenate(projected, axis=1)
        elif ff in ("concat_channel", "concat_channel_ln"):
            fused = self.feature_fusion(params["feature_fusion"], jnp.concatenate(projected, axis=-1))
        elif "cross_attention" in ff:
            fused, mixer = self.feature_fusion(params["feature_fusion"], projected)
        elif ff == "scalar":
            fused, mixer = self.feature_fusion(params["feature_fusion"], projected)
        else:
            raise NotImplementedError(f'feature_fusion "{ff}" doesn\'t exist')
        return fused, mixer

    def embed_multimodal(
        self,
        params: PyTree,
        input_ids: Array,  # [B, T] right-padded
        attention_mask: Array,  # [B, T]
        visual_embeds: Array,  # [B, V, llm_dim]
        labels: Optional[Array] = None,  # [B, T]
        is_multimodal: Optional[Array] = None,  # [B] bool
    ) -> Tuple[Array, Array, Optional[Array]]:
        """Splice visual tokens after BOS (reference merv.py:633-719).

        Multimodal rows: [text[:bos] | visual | text[bos:]].
        Unimodal rows:   [text | zero-pad] with False mask / IGNORE labels.
        Both share the static shape [B, T+V, ...]; a per-row where() selects.
        """
        nbos = self.llm_backbone.bos_token_length
        embeds = self.llm_backbone.embed_input_ids(params["llm_backbone"], input_ids)
        B, T, E = embeds.shape
        V = visual_embeds.shape[1]
        visual_embeds = visual_embeds.astype(embeds.dtype)

        mm_embeds = jnp.concatenate([embeds[:, :nbos], visual_embeds, embeds[:, nbos:]], axis=1)
        uni_embeds = jnp.concatenate([embeds, jnp.zeros((B, V, E), embeds.dtype)], axis=1)

        am = attention_mask.astype(bool)
        mm_mask = jnp.concatenate([am[:, :nbos], jnp.ones((B, V), bool), am[:, nbos:]], axis=1)
        uni_mask = jnp.concatenate([am, jnp.zeros((B, V), bool)], axis=1)

        if is_multimodal is None:
            fused_embeds, fused_mask = mm_embeds, mm_mask
        else:
            sel = is_multimodal[:, None, None]
            fused_embeds = jnp.where(sel, mm_embeds, uni_embeds)
            fused_mask = jnp.where(is_multimodal[:, None], mm_mask, uni_mask)

        fused_labels = None
        if labels is not None:
            ign = jnp.full((B, V), IGNORE_INDEX, labels.dtype)
            mm_labels = jnp.concatenate([labels[:, :nbos], ign, labels[:, nbos:]], axis=1)
            uni_labels = jnp.concatenate([labels, ign], axis=1)
            fused_labels = mm_labels if is_multimodal is None else jnp.where(is_multimodal[:, None], mm_labels, uni_labels)

        return fused_embeds, fused_mask, fused_labels

    def forward(
        self,
        params: PyTree,
        input_ids: Array,
        attention_mask: Array,
        video_values: Sequence[Array],
        labels: Optional[Array] = None,
        is_image: Optional[Array] = None,
        is_multimodal: Optional[Array] = None,
        remat: bool = False,
        attn_impl: str = "auto",
        loss_chunk_size: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Full multimodal forward. Returns dict(logits, loss, mixer).

        ``loss_chunk_size``: when set (and labels given), the [B, T, vocab]
        logits tensor is never materialized — the loss streams over token
        blocks through the lm_head (see :func:`chunked_causal_lm_loss`).
        ``logits`` is None in that mode. At full scale the direct path's fp32
        logits + log_softmax cost O(B*T*32000) HBM (6.3 GiB/device at the
        align recipe) — the single largest training activation.
        """
        feats = self.encode_videos(params, video_values, is_image)
        visual, mixer = self.project_and_fuse(params, feats)
        embeds, mask, fused_labels = self.embed_multimodal(
            params, input_ids, attention_mask, visual, labels, is_multimodal
        )
        dec = self.llm_backbone.decoder
        if fused_labels is not None and loss_chunk_size:
            hidden, _ = dec(
                params["llm_backbone"], inputs_embeds=embeds, attention_mask=mask,
                remat=remat, attn_impl=attn_impl, return_hidden=True,
            )
            loss = chunked_causal_lm_loss(
                dec, params["llm_backbone"], hidden, fused_labels, block=loss_chunk_size
            )
            return {"logits": None, "loss": loss, "mixer": mixer, "attention_mask": mask, "labels": fused_labels}
        logits, _ = dec(
            params["llm_backbone"], inputs_embeds=embeds, attention_mask=mask,
            remat=remat, attn_impl=attn_impl,
        )
        loss = None if fused_labels is None else causal_lm_loss(logits, fused_labels)
        return {"logits": logits, "loss": loss, "mixer": mixer, "attention_mask": mask, "labels": fused_labels}

    # ------------------------------------------------------------------------------
    # Generation
    # ------------------------------------------------------------------------------

    def generate_ids(
        self,
        params: PyTree,
        input_ids: Array,
        attention_mask: Array,
        video_values: Sequence[Array],
        is_image: Optional[Array] = None,
        is_multimodal: Optional[Array] = None,
        max_new_tokens: int = 128,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p: float = 1.0,
        top_k: int = 0,
        min_length: int = 1,
        rng: Optional[Array] = None,
        kv_cache_dtype: Optional[str] = None,
        mesh: Optional[Any] = None,
        speculative_gamma: int = 0,
        speculative_ngram: int = 2,
    ) -> Array:
        """Batched multimodal generation -> new token ids [B, max_new_tokens].

        ``speculative_gamma > 0`` turns on prompt-lookup speculative decoding
        (greedy, B=1 only — see ``generation.generate_speculative``): drafts
        from the TEXT prompt tokens, verifies gamma+1 tokens per HBM-bound
        weight stream. Output is token-identical to the plain path.

        ``mesh``: optional device mesh scoped over the serve trace
        (``activation_mesh``) — required for mesh-aware serving modes like the
        sp-sharded KV cache (``sharded_cache_attention``); plain TP serving
        needs no scope (GSPMD propagates from the sharded params).

        The WHOLE pipeline (towers -> projectors -> fusion -> splice ->
        prefill -> decode scan) runs as one jitted program per
        (shapes, generation-config) pair. Serving used to trace this eagerly:
        hundreds of per-op dispatches, each paying tunnel RTT — and on a
        remote-compile platform, a fresh sub-second XLA compile per primitive
        (a ~20 min wall-clock stall per eval config before any output).
        """
        cfg = GenerationConfig(
            max_new_tokens=max_new_tokens, do_sample=do_sample, temperature=temperature, top_p=top_p,
            top_k=top_k, min_length=min_length,
            eos_token_id=self.llm_backbone.stop_token_id, pad_token_id=self.llm_backbone.pad_token_id,
            kv_cache_dtype=kv_cache_dtype,
        )
        flags = (is_image is not None, is_multimodal is not None)
        cache = self.__dict__.setdefault("_serve_jit_cache", {})
        fn = cache.get(("generate", cfg, flags, mesh, speculative_gamma, speculative_ngram))
        if fn is None:
            def run(params, input_ids, attention_mask, videos, is_image, is_multimodal, rng):
                from merv_tpu.parallel.sharding import activation_mesh

                with activation_mesh(mesh):
                    feats = self.encode_videos(params, videos, is_image)
                    visual, _ = self.project_and_fuse(params, feats)
                    embeds, mask, _ = self.embed_multimodal(
                        params, input_ids, attention_mask, visual, None, is_multimodal
                    )
                    if speculative_gamma > 0:
                        from merv_tpu.models.generation import generate_speculative

                        return generate_speculative(
                            self.llm_backbone.decoder, params["llm_backbone"],
                            inputs_embeds=embeds, attention_mask=mask.astype(jnp.int32),
                            prompt_lookup_ids=input_ids, lookup_mask=attention_mask,
                            config=cfg, gamma=speculative_gamma, ngram=speculative_ngram,
                            rng=rng,
                        )
                    return _generate(
                        self.llm_backbone.decoder, params["llm_backbone"],
                        inputs_embeds=embeds, attention_mask=mask.astype(jnp.int32), config=cfg, rng=rng,
                    )

            fn = jax.jit(run)
            cache[("generate", cfg, flags, mesh, speculative_gamma, speculative_ngram)] = fn
        return fn(
            params, input_ids, attention_mask, list(video_values), is_image, is_multimodal,
            jax.random.PRNGKey(0) if rng is None else rng,
        )

    def generate_batch(
        self,
        params: PyTree,
        videos: Sequence[Any],
        prompt_texts: Sequence[str],
        num_frames: Optional[List[int]] = None,
        max_new_tokens: int = 128,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p: float = 1.0,
        top_k: int = 0,
        min_length: int = 1,
        clip_args: Optional[Sequence[Dict[str, Any]]] = None,
        rng: Optional[Array] = None,
        pad_to_batch: Optional[int] = None,
        kv_cache_dtype: Optional[str] = None,
        mesh: Optional[Any] = None,
    ) -> List[str]:
        """Batched multi-video generation — ONE prefill + ONE decode program for
        the whole batch (the reference generates bs=1; batching is the main
        TPU serving win). ``videos`` entries: path / raw uint8 array / None.
        Prompt lengths pad to static buckets and (with ``pad_to_batch``) the
        batch pads to a fixed size, bounding the number of compiled programs
        an eval run can create (see ``_prepare_batch_inputs``).
        """
        import numpy as np

        n_real = len(videos)
        input_ids, attention_mask, vids, is_mm = self._prepare_batch_inputs(
            videos, prompt_texts, num_frames, clip_args, pad_to_batch=pad_to_batch
        )

        tokens = self.generate_ids(
            params, jnp.asarray(input_ids), jnp.asarray(attention_mask), vids,
            is_multimodal=jnp.asarray(is_mm),
            max_new_tokens=max_new_tokens, do_sample=do_sample,
            temperature=temperature, top_p=top_p, top_k=top_k, min_length=min_length, rng=rng,
            kv_cache_dtype=kv_cache_dtype, mesh=mesh,
        )
        stop = self.llm_backbone.stop_token_id
        tok = self.llm_backbone.tokenizer
        outs = []
        for row in np.asarray(tokens)[:n_real]:
            row = row.tolist()
            if stop in row:
                row = row[: row.index(stop)]
            outs.append(tok.decode(row, skip_special_tokens=True).strip())
        return outs

    # ------------------------------------------------------------------------------
    # Video-prefix KV caching (shared-video serving)
    # ------------------------------------------------------------------------------

    def build_video_prefix(
        self,
        params: PyTree,
        video: Any,
        num_frames: Optional[List[int]] = None,
        clip_args: Optional[Dict[str, Any]] = None,
        kv_cache_dtype: Optional[str] = None,
        bos_ids: Optional[Any] = None,
    ) -> Any:
        """Towers + fusion + ``[BOS | visual]`` KV prefill, ONCE per video.

        Eval sets ask several questions about the same video, and the spliced
        prefix (reference splice-after-BOS, merv.py:633-650) depends only on
        the video — so the tower forward (~44% of prefill time) and the
        1025-token prefix KV can be shared across all of them. Returns a
        :class:`~merv_tpu.models.generation.VideoPrefix` — the cache plus the
        BOS ids / KV dtype it was built with, so :meth:`generate_batch_shared`
        can verify an externally supplied prefix actually pairs with the
        request. One jitted program per video shape set.
        """
        from merv_tpu.models.generation import VideoPrefix, prefill_prefix
        from merv_tpu.preprocessing.transforms import subsample_frames
        import numpy as np

        if num_frames is None:
            num_frames = [vb.num_frames for vb in self.video_backbones]
        if isinstance(video, str) or hasattr(video, "__fspath__"):
            video = _load_media(video, max(num_frames), **(clip_args or {}))
        video = np.asarray(video)
        vids = []
        _dbg = os.environ.get("MERV_TPU_DEBUG_PREFIX_TIMING") == "1"
        for vb, nf in zip(self.video_backbones, num_frames):
            _t0 = time.perf_counter()
            frames = subsample_frames(video, nf)
            v = vb.get_video_transform()(jnp.asarray(frames))[None]
            if _dbg:
                v.block_until_ready()
                overwatch.info(
                    f"[prefix-timing] {type(vb).__name__} transform {nf}f: "
                    f"{time.perf_counter() - _t0:.2f}s"
                )
            vids.append(v)

        _t0 = time.perf_counter()
        nbos = self.llm_backbone.bos_token_length
        if bos_ids is None:
            bos = self.llm_backbone.tokenizer(".", truncation=True).input_ids[:nbos]
            bos_ids = jnp.asarray([bos], jnp.int32) if nbos else jnp.zeros((1, 1), jnp.int32)
        if _dbg:
            overwatch.info(f"[prefix-timing] bos tokenize: {time.perf_counter() - _t0:.2f}s")

        cache = self.__dict__.setdefault("_serve_jit_cache", {})
        key = ("vprefix", kv_cache_dtype)
        fn = cache.get(key)
        if fn is None:
            def run(params, videos, bos_ids):
                feats = self.encode_videos(params, videos, None)
                visual, _ = self.project_and_fuse(params, feats)
                dec = self.llm_backbone.decoder
                if nbos:
                    bos_embeds = self.llm_backbone.embed_input_ids(params["llm_backbone"], bos_ids)
                    prefix = jnp.concatenate([bos_embeds, visual.astype(bos_embeds.dtype)], axis=1)
                else:
                    prefix = visual
                return prefill_prefix(
                    dec, params["llm_backbone"], inputs_embeds=prefix,
                    kv_cache_dtype=kv_cache_dtype,
                )

            fn = jax.jit(run)
            cache[key] = fn
        bos_tuple = tuple(int(t) for t in np.asarray(bos_ids)[0]) if nbos else ()
        if _dbg:
            overwatch.info(f"[prefix-timing] bos sync: {time.perf_counter() - _t0:.2f}s")
            _t0 = time.perf_counter()
        out = fn(params, vids, bos_ids)
        if _dbg:
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
            overwatch.info(f"[prefix-timing] prefix program: {time.perf_counter() - _t0:.2f}s")
        return VideoPrefix(cache=out, bos_ids=bos_tuple, kv_cache_dtype=kv_cache_dtype)

    def generate_ids_shared(
        self,
        params: PyTree,
        prefix_cache: Any,
        suffix_ids: Array,  # [B, Ts] right-padded post-BOS prompt tokens
        suffix_mask: Array,  # [B, Ts]
        max_new_tokens: int = 128,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p: float = 1.0,
        top_k: int = 0,
        min_length: int = 1,
        rng: Optional[Array] = None,
        kv_cache_dtype: Optional[str] = None,
    ) -> Array:
        """Batched generation against a shared video-prefix cache.

        Token-identical to :meth:`generate_ids` on the full spliced sequence
        (pinned by ``test_shared_video_prefix_matches_full``); each question
        pays only its suffix prefill + decode instead of towers + full
        prefill. One jitted program per (config, shape) pair.
        """
        from merv_tpu.models.generation import VideoPrefix, generate_with_prefix

        if isinstance(prefix_cache, VideoPrefix):
            if prefix_cache.kv_cache_dtype != kv_cache_dtype:
                raise ValueError(
                    f"prefix cache was built with kv_cache_dtype="
                    f"{prefix_cache.kv_cache_dtype!r} but this request asks for "
                    f"{kv_cache_dtype!r}"
                )
            prefix_cache = prefix_cache.cache

        cfg = GenerationConfig(
            max_new_tokens=max_new_tokens, do_sample=do_sample, temperature=temperature,
            top_p=top_p, top_k=top_k, min_length=min_length,
            eos_token_id=self.llm_backbone.stop_token_id,
            pad_token_id=self.llm_backbone.pad_token_id,
            kv_cache_dtype=kv_cache_dtype,
        )
        cache = self.__dict__.setdefault("_serve_jit_cache", {})
        key = ("vsuffix", cfg)
        fn = cache.get(key)
        if fn is None:
            def run(params, prefix_cache, suffix_ids, suffix_mask, rng):
                return generate_with_prefix(
                    self.llm_backbone.decoder, params["llm_backbone"], prefix_cache,
                    suffix_ids=suffix_ids, suffix_mask=suffix_mask, config=cfg, rng=rng,
                )

            fn = jax.jit(run)
            cache[key] = fn
        return fn(params, prefix_cache, suffix_ids, suffix_mask,
                  jax.random.PRNGKey(0) if rng is None else rng)

    def generate_batch_shared(
        self,
        params: PyTree,
        video: Any,
        prompt_texts: Sequence[str],
        num_frames: Optional[List[int]] = None,
        max_new_tokens: int = 128,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p: float = 1.0,
        top_k: int = 0,
        min_length: int = 1,
        clip_args: Optional[Dict[str, Any]] = None,
        rng: Optional[Array] = None,
        pad_to_batch: Optional[int] = None,
        length_bucket: int = 64,
        kv_cache_dtype: Optional[str] = None,
        prefix_cache: Any = None,
    ) -> List[str]:
        """ONE video, many questions: towers + video-prefix prefill run once,
        each question pays only its suffix prefill + decode (the multi-
        question-per-video regime every MERV eval set is in). Same bucketing
        discipline as :meth:`generate_batch`. Pass ``prefix_cache`` (from
        :meth:`build_video_prefix`) to reuse a prefix across calls.
        """
        import numpy as np

        from merv_tpu.models.generation import VideoPrefix

        n_real = len(prompt_texts)
        nbos = self.llm_backbone.bos_token_length
        tok = self.llm_backbone.tokenizer
        id_lists = [tok(p, truncation=True).input_ids for p in prompt_texts]
        if nbos:
            bos = id_lists[0][:nbos]
            if not all(ids[:nbos] == bos for ids in id_lists):
                raise ValueError(
                    "prompts disagree on BOS: a shared prefix bakes one BOS "
                    f"into its cache, got {sorted({tuple(i[:nbos]) for i in id_lists})}"
                )
        else:
            bos = []
        if isinstance(prefix_cache, VideoPrefix) and prefix_cache.bos_ids != tuple(bos):
            raise ValueError(
                f"prefix cache was built with bos_ids={prefix_cache.bos_ids} "
                f"but these prompts tokenize to bos_ids={tuple(bos)}"
            )
        suffixes = [ids[nbos:] for ids in id_lists]
        if any(len(s) == 0 for s in suffixes):
            empty = [i for i, s in enumerate(suffixes) if not s]
            raise ValueError(
                f"prompts {empty} are empty after BOS stripping: the shared-"
                "prefix path needs at least one suffix token per row to anchor "
                "its first sampled position"
            )
        if pad_to_batch is not None and n_real < pad_to_batch:
            suffixes += [suffixes[-1]] * (pad_to_batch - n_real)
        B = len(suffixes)
        Ts = max(1, max(len(s) for s in suffixes))
        if length_bucket > 1:
            cap = max(self.llm_backbone.llm_max_length, Ts)
            Ts = min(-(-Ts // length_bucket) * length_bucket, cap)
        pad = self.llm_backbone.pad_token_id
        suffix_ids = np.full((B, Ts), pad, np.int32)
        suffix_mask = np.zeros((B, Ts), np.int32)
        for b, s in enumerate(suffixes):
            suffix_ids[b, : len(s)] = s
            suffix_mask[b, : len(s)] = 1

        if prefix_cache is None:
            prefix_cache = self.build_video_prefix(
                params, video, num_frames, clip_args, kv_cache_dtype=kv_cache_dtype,
                bos_ids=jnp.asarray([bos], jnp.int32) if nbos else None,
            )
        tokens = self.generate_ids_shared(
            params, prefix_cache, jnp.asarray(suffix_ids), jnp.asarray(suffix_mask),
            max_new_tokens=max_new_tokens, do_sample=do_sample, temperature=temperature,
            top_p=top_p, top_k=top_k, min_length=min_length, rng=rng,
            kv_cache_dtype=kv_cache_dtype,
        )
        stop = self.llm_backbone.stop_token_id
        outs = []
        for row in np.asarray(tokens)[:n_real]:
            row = row.tolist()
            if stop in row:
                row = row[: row.index(stop)]
            outs.append(tok.decode(row, skip_special_tokens=True).strip())
        return outs

    def _prepare_batch_inputs(
        self,
        videos: Sequence[Any],
        prompt_texts: Sequence[str],
        num_frames: Optional[List[int]] = None,
        clip_args: Optional[Sequence[Dict[str, Any]]] = None,
        length_bucket: int = 64,
        pad_to_batch: Optional[int] = None,
    ):
        """Tokenize + right-pad prompts, decode + per-encoder transform videos.

        ``pad_to_batch``: pad the batch with inert unimodal rows up to a fixed
        size so a partial final eval group reuses the full group's compiled
        program instead of compiling its own (callers slice outputs back to
        the real batch).

        Prompt lengths pad up to a STATIC bucket (multiples of
        ``length_bucket``, capped at ``llm_max_length``) instead of the batch
        max: every distinct padded length compiles its own prefill/decode
        program pair, so without buckets a real eval set pays one multi-minute
        compile per distinct prompt length (BASELINE.md config-4 proof was
        compile-dominated for exactly this reason). Extra pad positions are
        inert — the right-padding mask semantics are pinned by
        ``test_batched_padded_generation_consistent``. ``length_bucket=1``
        restores exact batch-max padding.
        """
        import numpy as np

        from merv_tpu.preprocessing.transforms import subsample_frames

        if num_frames is None:
            num_frames = [vb.num_frames for vb in self.video_backbones]
        B = len(videos)
        assert len(prompt_texts) == B
        clip_args = list(clip_args) if clip_args else [{}] * B
        if pad_to_batch is not None and B < pad_to_batch:
            n_pad = pad_to_batch - B
            videos = list(videos) + [None] * n_pad
            prompt_texts = list(prompt_texts) + ["."] * n_pad
            clip_args = clip_args + [{}] * n_pad
            B = pad_to_batch

        tok = self.llm_backbone.tokenizer
        id_lists = [tok(p, truncation=True).input_ids for p in prompt_texts]
        T = max(len(ids) for ids in id_lists)
        if length_bucket > 1:
            cap = self.llm_backbone.llm_max_length
            T = min(-(-T // length_bucket) * length_bucket, max(cap, T))
        pad = self.llm_backbone.pad_token_id
        input_ids = np.full((B, T), pad, np.int32)
        attention_mask = np.zeros((B, T), np.int32)
        for b, ids in enumerate(id_lists):
            input_ids[b, : len(ids)] = ids
            attention_mask[b, : len(ids)] = 1

        per_encoder = [[] for _ in self.video_backbones]
        is_mm = []
        for b, video in enumerate(videos):
            if video is None:
                for e, vb in enumerate(self.video_backbones):
                    per_encoder[e].append(jnp.zeros(vb.default_video_resolution, jnp.float32))
                is_mm.append(False)
                continue
            if isinstance(video, str) or hasattr(video, "__fspath__"):
                video = _load_media(video, max(num_frames), **clip_args[b])
            video = np.asarray(video)
            for e, (vb, nf) in enumerate(zip(self.video_backbones, num_frames)):
                frames = subsample_frames(video, nf)
                per_encoder[e].append(vb.get_video_transform()(jnp.asarray(frames)))
            is_mm.append(True)
        vids = [jnp.stack(v) for v in per_encoder]
        return jnp.asarray(input_ids), jnp.asarray(attention_mask), vids, jnp.asarray(is_mm)

    def score_options(
        self,
        params: PyTree,
        videos: Sequence[Any],
        prompt_texts: Sequence[str],
        option_strings: Sequence[Sequence[str]],
        num_frames: Optional[List[int]] = None,
        clip_args: Optional[Sequence[Dict[str, Any]]] = None,
        pad_to_batch: Optional[int] = None,
        mesh: Optional[Any] = None,
    ) -> List[str]:
        """Likelihood MCQ readout: one batched prefill, next-token logits at the
        last prompt position restricted to single-token candidates.

        The reference builds these readout token ids (``string2idx``,
        reference merv.py:239-244) but never consumes them; here they power
        ``eval_mcq --strategy likelihood`` — no decode loop at all, so MCQ
        eval costs exactly one prefill per batch.
        """
        import numpy as np

        input_ids, attention_mask, vids, is_mm = self._prepare_batch_inputs(
            videos, prompt_texts, num_frames, clip_args, pad_to_batch=pad_to_batch
        )
        # last-position-only lm_head (decoder logits_indices fast path): the
        # full [B, T, V] logits buffer would be ~2.7 GB bf16 for qwen-scale
        # vocabs at fused-sequence length — ~1000x the needed lm_head work.
        # One jitted program per shape set (see generate_ids on why eager
        # serving dispatch is pathological on remote-compile platforms).
        cache = self.__dict__.setdefault("_serve_jit_cache", {})
        fn = cache.get(("score", mesh))
        if fn is None:
            def run(params, input_ids, attention_mask, videos, is_mm):
                from merv_tpu.parallel.sharding import activation_mesh

                with activation_mesh(mesh):
                    feats = self.encode_videos(params, videos)
                    visual, _ = self.project_and_fuse(params, feats)
                    embeds, mask, _ = self.embed_multimodal(
                        params, input_ids, attention_mask, visual, None, is_mm
                    )
                    last = jnp.sum(mask.astype(jnp.int32), axis=1) - 1
                    logits, _ = self.llm_backbone.decoder(
                        params["llm_backbone"], inputs_embeds=embeds, attention_mask=mask,
                        logits_indices=last.astype(jnp.int32),
                    )
                    return logits[:, 0].astype(jnp.float32)

            fn = jax.jit(run)
            cache[("score", mesh)] = fn
        rows = np.asarray(fn(params, input_ids, attention_mask, vids, is_mm))  # [B, V] next-token logits
        picks = []
        V = rows.shape[1]
        for b, options in enumerate(option_strings):
            ids = [self.string2idx[s] for s in options]
            # ids beyond the LM head (tiny test vocabs) score -inf
            scores = [rows[b, i] if i < V else -np.inf for i in ids]
            picks.append(options[int(np.argmax(scores))])
        return picks

    def generate(
        self,
        params: PyTree,
        video: Any,
        prompt_text: str,
        num_frames: Optional[List[int]] = None,
        max_new_tokens: int = 128,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p: float = 1.0,
        top_k: int = 0,
        min_length: int = 1,
        clip_start_sec: float = 0.0,
        clip_end_sec: Optional[float] = None,
        end_frame: Optional[int] = None,
        rng: Optional[Array] = None,
        kv_cache_dtype: Optional[str] = None,
        mesh: Optional[Any] = None,
        speculative_gamma: int = 0,
        speculative_ngram: int = 2,
    ) -> str:
        """Single-example convenience API (reference merv.py:779-830).

        ``video`` may be a path (decoded via merv_tpu.preprocessing.load_video),
        a raw uint8 [T, H, W, C] array, or None (text-only: zero video tensors,
        reference merv.py:807-811).
        """
        import numpy as np

        # one-element batch through the shared batched path: same tokenizer
        # truncation, same static length buckets (one compiled prefill/decode
        # pair per bucket — a second copy of the bucket rule here would let
        # the two compile-program sets drift apart)
        input_ids, attention_mask, vids, is_multimodal = self._prepare_batch_inputs(
            [video], [prompt_text], num_frames,
            clip_args=[dict(clip_start_sec=clip_start_sec, clip_end_sec=clip_end_sec, end_frame=end_frame)],
        )
        tok = self.llm_backbone.tokenizer
        tokens = self.generate_ids(
            params, input_ids, attention_mask, vids, is_multimodal=is_multimodal,
            max_new_tokens=max_new_tokens, do_sample=do_sample, temperature=temperature, top_p=top_p,
            top_k=top_k, min_length=min_length, rng=rng, kv_cache_dtype=kv_cache_dtype, mesh=mesh,
            speculative_gamma=speculative_gamma, speculative_ngram=speculative_ngram,
        )
        out = np.asarray(tokens[0]).tolist()
        stop = self.llm_backbone.stop_token_id
        if stop in out:
            out = out[: out.index(stop)]
        return tok.decode(out, skip_special_tokens=True).strip()

    # ------------------------------------------------------------------------------
    # Stage freezing (reference merv.py:305-387)
    # ------------------------------------------------------------------------------

    def freeze_backbones(self, stage: str) -> None:
        """Record trainable module keys per stage; video towers always frozen."""
        if stage in ("align", "second_align"):
            self.trainable_module_keys = ["projectors", "feature_fusion"]
            self.video_backbone_requires_grad = False
        elif stage in ("finetune", "full-align", "second_finetune", "full-finetune"):
            self.trainable_module_keys = ["llm_backbone", "projectors", "feature_fusion"]
            self.video_backbone_requires_grad = False
        else:
            raise ValueError(f"Stage {stage} is not supported!")
        overwatch.info(f"Stage {stage}: trainable modules = {self.trainable_module_keys}")

    def trainable_mask(self, params: PyTree) -> PyTree:
        """Boolean pytree for optax.masked matching trainable_module_keys."""
        keys = set(self.trainable_module_keys or ["projectors", "feature_fusion"])
        key_map = {"llm_backbone": "llm_backbone", "projectors": "projectors", "feature_fusion": "feature_fusion"}

        def mark(top: str, sub: PyTree) -> PyTree:
            trainable = key_map.get(top) in keys
            return jax.tree_util.tree_map(lambda _: trainable, sub)

        return {top: mark(top, sub) for top, sub in params.items()}


def chunked_causal_lm_loss(
    decoder: Any,
    llm_params: PyTree,
    hidden: Array,  # [B, T, E] post-final-norm hidden states
    labels: Array,  # [B, T]
    block: int = 256,
) -> Array:
    """Next-token CE without materializing [B, T, vocab] logits.

    ``lax.scan`` over token blocks with a remat'd body: each block projects
    [B, block, E] through the lm_head, takes its fp32 log-softmax NLL, and
    only the scalar (sum, count) carry survives; the backward recomputes each
    block's logits flash-style. Live memory drops from O(B*T*V) fp32 (plus a
    log_softmax copy and its gradient) to O(B*block*V). Per-row math is
    IDENTICAL to :func:`causal_lm_loss` (same dtype path: compute-dtype
    lm_head GEMM, fp32 log-softmax); only the cross-block summation order
    differs, so losses agree to fp32 tolerance, not bitwise.
    """
    B, T, E = hidden.shape
    # shift once, then the scan is a plain per-position loop
    shifted = jnp.concatenate(
        [labels[:, 1:], jnp.full((B, 1), IGNORE_INDEX, labels.dtype)], axis=1
    )
    pad = (-T) % block
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        shifted = jnp.pad(shifted, ((0, 0), (0, pad)), constant_values=IGNORE_INDEX)
    nb = (T + pad) // block

    # blocks are dynamic-sliced out of the ORIGINAL [B, T, E] buffer: a
    # reshape+transpose into scan xs would make XLA materialize a second
    # full-activation copy in exactly the path this function exists to slim
    def body(i: Array):
        from merv_tpu.parallel.sharding import constrain_batch_dim

        h_blk = jax.lax.dynamic_slice_in_dim(hidden, i * block, block, axis=1)
        l_blk = jax.lax.dynamic_slice_in_dim(shifted, i * block, block, axis=1)
        logits = decoder.lm_head_apply(llm_params, constrain_batch_dim(h_blk)).astype(jnp.float32)
        valid = l_blk != IGNORE_INDEX
        safe = jnp.where(valid, l_blk, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        return nll.sum(), valid.sum()

    def scan_body(carry, i):
        s, c = jax.checkpoint(body)(i)
        return (carry[0] + s, carry[1] + c), None

    (nll_sum, count), _ = jax.lax.scan(
        scan_body,
        (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        jnp.arange(nb, dtype=jnp.int32),
    )
    return nll_sum / jnp.maximum(count, 1)


def causal_lm_loss(logits: Array, labels: Array) -> Array:
    """Next-token CE with IGNORE_INDEX masking (HF CausalLM loss semantics)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)
