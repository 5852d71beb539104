"""LLM backbone layer: per-family metadata + functional decoder + tokenizer.

Capability parity with the reference LLM backbone classes
(reference ``merv/models/backbones/llm/base_llm.py:37-235``, ``llama2.py``,
``llama3.py``, ``qwen2.py``): every registered ``llm_backbone_id`` resolves to
a :class:`LLMBackbone` bundling

- the :class:`~merv_tpu.models.backbones.llm.transformer.DecoderConfig` for the
  functional JAX decoder (replacing HF ``{Model}ForCausalLM``),
- the tokenizer (HF fast tokenizer, right padding enforced; byte-level offline
  fallback),
- the prompt-builder class,
- pad/eos token handling quirks per family:
  llama2/vicuna add ``<PAD>`` and resize embeddings to a multiple of 64
  (reference ``llama2.py:73-76``); llama3 same (``llama3.py:55-58``);
  llama3.1 and qwen2.5 use pad id 128004 without resize (``llama3.py:103-104``,
  ``qwen2.py:49-50``); qwen2.5 has **no BOS token** (handled by
  ``bos_token_length==0`` in the VidLM forward, reference ``merv.py:521``).

There is no "inference_mode" empty-init distinction for MATERIALIZATION:
functional params are always created explicitly (random ``init`` or checkpoint
import), so the reference's meta-device dance (``base_llm.py:130-133``) has no
analogue. ``inference_mode=True`` does change the PARAM DTYPE to half
precision (the reference's autocast/`.to(half)` serving contract): a 7B fp32
tree is 27 GB and cannot exist on a 16 GB serving chip.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Type

import jax
import jax.numpy as jnp

from merv_tpu.models.backbones.llm.prompting import (
    LLaMa2ChatPromptBuilder,
    LLaMa31PromptBuilder,
    PromptBuilder,
    PurePromptBuilder,
    Qwen2PromptBuilder,
    VicunaV15ChatPromptBuilder,
)
from merv_tpu.models.backbones.llm.tokenization import load_tokenizer
from merv_tpu.models.backbones.llm.transformer import (
    LLAMA2_7B,
    LLAMA2_13B,
    LLAMA3_8B,
    LLAMA31_8B,
    QWEN25_3B,
    QWEN25_7B,
    DecoderConfig,
    LlamaDecoder,
    tiny_decoder_config,
)

Array = jax.Array
PyTree = Any


@dataclass(frozen=True)
class LLMSpec:
    """Static registry entry for one llm_backbone_id."""

    llm_family: str
    hf_hub_path: str
    decoder_config: DecoderConfig
    prompt_builder_cls: Type[PromptBuilder]
    half_precision_dtype: Any = jnp.bfloat16
    has_bos: bool = True
    pad_token_id: int = 0
    eos_token_id: int = 2
    # generation stop id if different from eos (llama3-chat uses <|eot_id|>)
    stop_token_id: Optional[int] = None


# fmt: off
LLM_SPECS: Dict[str, LLMSpec] = {
    # === LLaMa-2 Pure (Non-Chat) ===
    "llama2-7b-pure":   LLMSpec("llama2", "meta-llama/Llama-2-7b-hf", LLAMA2_7B, PurePromptBuilder, pad_token_id=32000),
    "llama2-13b-pure":  LLMSpec("llama2", "meta-llama/Llama-2-13b-hf", LLAMA2_13B, PurePromptBuilder, pad_token_id=32000),
    # === LLaMa-2 Chat ===
    "llama2-7b-chat":   LLMSpec("llama2", "meta-llama/Llama-2-7b-chat-hf", LLAMA2_7B, LLaMa2ChatPromptBuilder, pad_token_id=32000),
    "llama2-13b-chat":  LLMSpec("llama2", "meta-llama/Llama-2-13b-chat-hf", LLAMA2_13B, LLaMa2ChatPromptBuilder, pad_token_id=32000),
    # === Vicuna v1.5 ===
    "vicuna-v15-7b":    LLMSpec("llama2", "lmsys/vicuna-7b-v1.5", LLAMA2_7B, VicunaV15ChatPromptBuilder, pad_token_id=32000),
    "vicuna-v15-13b":   LLMSpec("llama2", "lmsys/vicuna-13b-v1.5", LLAMA2_13B, VicunaV15ChatPromptBuilder, pad_token_id=32000),
    # === LLaMa-3 (pad <PAD> added at 128256, resize to 128320) ===
    "llama3-8b-pure":   LLMSpec("llama3", "meta-llama/Meta-Llama-3-8B", LLAMA3_8B, PurePromptBuilder, pad_token_id=128256, eos_token_id=128001),
    "llama3-8b-chat":   LLMSpec("llama3", "meta-llama/Meta-Llama-3-8B-Instruct", LLAMA3_8B, LLaMa31PromptBuilder, pad_token_id=128256, eos_token_id=128001, stop_token_id=128009),
    # === LLaMa-3.1 (pad = <|finetune_right_pad_id|> 128004, no resize) ===
    "llama3.1-8b-chat": LLMSpec("llama31", "meta-llama/Llama-3.1-8B-Instruct", LLAMA31_8B, LLaMa31PromptBuilder, pad_token_id=128004, eos_token_id=128009),
    # === Qwen-2.5 Instruct (no BOS; fp16 half precision; reference pins pad 128004, qwen2.py:49-50) ===
    "qwen2.5-7b-instruct": LLMSpec("qwen2", "Qwen/Qwen2.5-7B-Instruct", QWEN25_7B, Qwen2PromptBuilder, half_precision_dtype=jnp.float16, has_bos=False, pad_token_id=128004, eos_token_id=151645),
    "qwen2.5-3b-instruct": LLMSpec("qwen2", "Qwen/Qwen2.5-3B-Instruct", QWEN25_3B, Qwen2PromptBuilder, half_precision_dtype=jnp.float16, has_bos=False, pad_token_id=128004, eos_token_id=151645),
}
# fmt: on


class LLMBackbone:
    """A registered LLM: functional decoder + tokenizer + prompting."""

    def __init__(
        self,
        llm_backbone_id: str,
        llm_max_length: int = 2048,
        hf_token: Optional[str] = None,
        inference_mode: bool = False,
        spec: Optional[LLMSpec] = None,
        sequence_parallel: bool = False,
        pipeline_parallel: bool = False,
        pp_microbatches: int = 0,
    ) -> None:
        assert spec is not None or llm_backbone_id in LLM_SPECS, f"unknown llm backbone {llm_backbone_id}"
        self.identifier = llm_backbone_id
        self.llm_max_length = llm_max_length
        self.inference_mode = inference_mode
        self.spec = spec if spec is not None else LLM_SPECS[llm_backbone_id]
        # opt the decoder into sp-axis ring attention (takes effect only when
        # the active mesh has sp>1 — see DecoderConfig.sequence_parallel)
        self.sequence_parallel = sequence_parallel
        # opt the decoder into pp-axis GPipe (takes effect only when the
        # active mesh has pp>1 — see DecoderConfig.pipeline_parallel)
        self.pipeline_parallel = pipeline_parallel
        self.pp_microbatches = pp_microbatches
        self._tokenizer: Any = None
        self._hf_token = hf_token

    # -- model -------------------------------------------------------------------

    @property
    def decoder_config(self) -> DecoderConfig:
        cfg = self.spec.decoder_config
        if self.sequence_parallel and not cfg.sequence_parallel:
            import dataclasses as _dc

            cfg = _dc.replace(cfg, sequence_parallel=True)
        if self.pipeline_parallel and not cfg.pipeline_parallel:
            import dataclasses as _dc

            cfg = _dc.replace(
                cfg, pipeline_parallel=True, pp_microbatches=self.pp_microbatches
            )
        if self.inference_mode:
            # serving stores params in half precision (the reference's
            # inference-mode + autocast contract, base_llm.py:130-138): a 7B
            # fp32 tree is 27 GB and does not even fit a 16 GB chip, let
            # alone beside the KV cache
            import dataclasses as _dc

            cfg = _dc.replace(cfg, param_dtype=self.spec.half_precision_dtype)
        return cfg

    @property
    def decoder(self) -> LlamaDecoder:
        return LlamaDecoder(self.decoder_config)

    @property
    def embed_dim(self) -> int:
        return self.decoder_config.hidden_size

    @property
    def half_precision_dtype(self) -> Any:
        return self.spec.half_precision_dtype

    def init(self, key: Array) -> PyTree:
        return self.decoder.init(key)

    def load_state_dict(self, state: Any, param_dtype: Any = jnp.bfloat16) -> PyTree:
        from merv_tpu.models.backbones.llm.hf_import import import_llama_state_dict

        return import_llama_state_dict(self.decoder_config, state, param_dtype=param_dtype)

    def __call__(self, params: PyTree, **kwargs: Any):
        return self.decoder(params, **kwargs)

    def embed_input_ids(self, params: PyTree, input_ids: Array) -> Array:
        return self.decoder.embed_input_ids(params, input_ids)

    # -- tokenizer / prompting ----------------------------------------------------

    @property
    def tokenizer(self) -> Any:
        if self._tokenizer is None:
            tok = load_tokenizer(
                self.spec.hf_hub_path,
                model_max_length=self.llm_max_length,
                hf_token=self._hf_token,
                add_bos_token=self.spec.has_bos,
            )
            # family pad-token quirks (see module docstring)
            if self.spec.llm_family in ("llama2", "llama3"):
                tok.add_special_tokens({"pad_token": "<PAD>"})
            elif self.spec.llm_family in ("llama31", "qwen2"):
                tok.pad_token = "<|finetune_right_pad_id|>"
            if getattr(tok, "pad_token_id", None) is None or isinstance(tok.pad_token_id, str):
                tok.pad_token_id = self.spec.pad_token_id
            self._tokenizer = tok
        return self._tokenizer

    @property
    def prompt_builder_fn(self) -> Type[PromptBuilder]:
        return self.spec.prompt_builder_cls

    @property
    def bos_token_length(self) -> int:
        """1 if the tokenizer emits a BOS token, else 0 (qwen2; reference merv.py:521)."""
        return 1 if self.spec.has_bos else 0

    @property
    def pad_token_id(self) -> int:
        return self.spec.pad_token_id

    @property
    def eos_token_id(self) -> int:
        return self.spec.eos_token_id

    @property
    def stop_token_id(self) -> int:
        return self.spec.stop_token_id if self.spec.stop_token_id is not None else self.spec.eos_token_id


def tiny_llm_backbone(
    llm_backbone_id: str = "tiny-pure",
    prompt_builder_cls: Type[PromptBuilder] = PurePromptBuilder,
    has_bos: bool = True,
    inference_mode: bool = False,
    **config_overrides: Any,
) -> LLMBackbone:
    """Small random LLM backbone with the ByteTokenizer (tests/benchmarks)."""
    cfg = tiny_decoder_config(**config_overrides)
    spec = LLMSpec(
        llm_family="tiny",
        hf_hub_path="__offline__/tiny",
        decoder_config=cfg,
        prompt_builder_cls=prompt_builder_cls,
        has_bos=has_bos,
        pad_token_id=0,
        eos_token_id=2,
    )
    return LLMBackbone(
        llm_backbone_id, llm_max_length=cfg.max_position_embeddings, spec=spec,
        inference_mode=inference_mode,
    )
