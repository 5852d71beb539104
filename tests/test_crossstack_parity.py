"""Tiny-scale FULL-MODEL cross-stack parity: reference ``MERV.forward`` vs ours.

Every other golden test is per-component (tower, LLM, projector, prompter).
This file runs the reference's *composed* model — splice-after-BOS, per-encoder
reshape, fusion weighting, unimodal vstack, label masking (reference
``merv/models/vidlms/merv.py:503-734``) — torch-vs-JAX on SHARED weights:

1. the reference ``MERV`` class is loaded from the mounted source with tiny
   stub backbones (its ctor takes backbone objects, reference ``merv.py:56-72``),
2. its projector/fusion/LLM state dicts are imported into our stack through
   the production :func:`merv_tpu.models.ckpt_import.import_merv_checkpoint`,
3. fp32 logits are compared ≤1e-4 through ``forward()`` on a batch mixing
   multimodal, unimodal, image-flagged, and padded rows.

The heavy reference deps (timm/decord/torchvision/hiera) are not installed
here; the loader below materialises the reference module graph file-by-file
with inert stand-ins for those imports (none of their symbols are exercised by
``forward``), restoring ``sys.modules`` afterwards so dep-skip tests elsewhere
stay honest.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merv_tpu.models.backbones.llm.base_llm import LLMBackbone as OurLLMBackbone
from merv_tpu.models.backbones.llm.base_llm import LLMSpec
from merv_tpu.models.backbones.llm.hf_import import import_llama_state_dict
from merv_tpu.models.backbones.llm.prompting import PurePromptBuilder
from merv_tpu.models.backbones.llm.transformer import DecoderConfig
from merv_tpu.models.backbones.video.base_video import VideoBackbone as OurVideoBackbone
from merv_tpu.models.ckpt_import import import_merv_checkpoint
from merv_tpu.models.vidlms import IGNORE_INDEX, MERV as OurMERV

torch = pytest.importorskip("torch")

REF_ROOT = Path("/root/reference")

# ---------------------------------------------------------------------------
# Reference-module loader (standalone, no pip deps beyond torch/transformers)
# ---------------------------------------------------------------------------

_REF_CACHE: dict = {}


def _stub_module(name: str, **attrs):
    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec (e.g. transformers' decord
    # availability probe) doesn't choke on the stub
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _load_reference_merv():
    """Load ``merv.models.vidlms.merv`` from the mounted reference source.

    Parent packages are synthesised so no reference ``__init__`` chain (which
    imports timm/hiera-backed towers) executes; only the files ``forward``
    actually needs are loaded, under their real dotted names.
    """
    if not REF_ROOT.exists():
        pytest.skip("reference repo not mounted")
    if _REF_CACHE:
        return _REF_CACHE["merv"], _REF_CACHE["base_video"], _REF_CACHE["base_llm"]

    stubs: dict = {}

    # --- inert stand-ins for uninstalled deps (symbols never called) ---
    tv_func = _stub_module("torchvision.transforms.functional", pad=lambda *a, **k: a[0])
    tv_transforms = _stub_module("torchvision.transforms", functional=tv_func)
    tv = _stub_module("torchvision", transforms=tv_transforms)
    stubs.update({"torchvision": tv, "torchvision.transforms": tv_transforms,
                  "torchvision.transforms.functional": tv_func})

    class _Never:
        def __init__(self, *a, **k):  # pragma: no cover
            raise RuntimeError("stub dep must not be instantiated in this test")

    timm_layers = _stub_module("timm.layers", LayerNorm2d=_Never, trunc_normal_=torch.nn.init.trunc_normal_)
    timm_regnet = _stub_module("timm.models.regnet", RegStage=_Never)
    timm_models = _stub_module("timm.models", regnet=timm_regnet)
    timm = _stub_module("timm", layers=timm_layers, models=timm_models)
    stubs.update({"timm": timm, "timm.layers": timm_layers, "timm.models": timm_models,
                  "timm.models.regnet": timm_regnet})

    decord = _stub_module(
        "decord", VideoReader=_Never, cpu=lambda *a, **k: None,
        bridge=types.SimpleNamespace(set_bridge=lambda s: None),
    )
    stubs["decord"] = decord

    def load(dotted: str, path: Path, search: list | None = None):
        spec = importlib.util.spec_from_file_location(dotted, path, submodule_search_locations=search)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[dotted] = mod
        spec.loader.exec_module(mod)
        return mod

    mroot = REF_ROOT / "merv"
    # only these keys are touched/cleaned — genuinely new imports pulled in as
    # side effects (torch.distributed.*, transformers.*) must NOT be evicted,
    # or their one-time C++ op registrations re-run on the next import
    managed = set(stubs) | {
        "merv", "merv.models", "merv.models.backbones", "merv.models.vidlms",
        "merv.preprocessing", "merv.preprocessing.datasets", "merv.util", "merv.overwatch",
        "merv.overwatch.overwatch", "merv.models.backbones.llm.prompting",
        "merv.models.backbones.llm", "merv.models.backbones.llm.base_llm",
        "merv.models.backbones.video", "merv.models.backbones.video.base_video",
        "merv.preprocessing.datasets.datasets", "merv.util.nn_utils",
        "merv.models.vidlms.base_vidlm", "merv.models.vidlms.merv",
    }
    saved = {k: sys.modules[k] for k in managed if k in sys.modules}
    try:
        sys.modules.update(stubs)
        # synthetic parent packages (no reference __init__ executed)
        for pkg in ("merv", "merv.models", "merv.models.backbones", "merv.models.vidlms",
                    "merv.preprocessing", "merv.preprocessing.datasets", "merv.util", "merv.overwatch"):
            sys.modules[pkg] = _stub_module(pkg)
            sys.modules[pkg].__path__ = []

        ow = load("merv.overwatch.overwatch", mroot / "overwatch" / "overwatch.py")
        sys.modules["merv.overwatch"].initialize_overwatch = ow.initialize_overwatch

        prompting_dir = mroot / "models" / "backbones" / "llm" / "prompting"
        load("merv.models.backbones.llm.prompting", prompting_dir / "__init__.py", [str(prompting_dir)])

        base_llm = load("merv.models.backbones.llm.base_llm", mroot / "models" / "backbones" / "llm" / "base_llm.py")
        sys.modules["merv.models.backbones.llm"] = _stub_module(
            "merv.models.backbones.llm", LLMBackbone=base_llm.LLMBackbone)

        base_video = load("merv.models.backbones.video.base_video",
                          mroot / "models" / "backbones" / "video" / "base_video.py")
        sys.modules["merv.models.backbones.video"] = _stub_module(
            "merv.models.backbones.video", VideoBackbone=base_video.VideoBackbone,
            VideoTransform=base_video.VideoTransform, ImageTransform=base_video.ImageTransform)

        load("merv.preprocessing.datasets.datasets", mroot / "preprocessing" / "datasets" / "datasets.py")
        load("merv.util.nn_utils", mroot / "util" / "nn_utils.py")
        load("merv.models.vidlms.base_vidlm", mroot / "models" / "vidlms" / "base_vidlm.py")
        ref_merv = load("merv.models.vidlms.merv", mroot / "models" / "vidlms" / "merv.py")
    finally:
        # keep the loaded reference modules alive via _REF_CACHE references, but
        # restore sys.modules so the fake timm/decord/torchvision don't leak
        # into other tests' importorskip checks
        for k in managed:
            if k in saved:
                sys.modules[k] = saved[k]
            else:
                sys.modules.pop(k, None)
        # drop reference prompting submodules loaded via the package's __init__
        for k in [k for k in sys.modules if k.startswith("merv.models.backbones.llm.prompting.")]:
            del sys.modules[k]

    _REF_CACHE.update({"merv": ref_merv, "base_video": base_video, "base_llm": base_llm})
    return ref_merv, base_video, base_llm


# ---------------------------------------------------------------------------
# Shared stub towers: identical fp32 math in torch and JAX
# ---------------------------------------------------------------------------


def _mix_matrix(dim: int) -> np.ndarray:
    return np.cos(0.7 * np.arange(3 * dim, dtype=np.float64)).astype(np.float32).reshape(3, dim)


def _stub_features_np(x: np.ndarray, frame_pool: int, grid: int, mix: np.ndarray) -> np.ndarray:
    """The stub featurizer, in numpy, as the single source of truth."""
    B, F, C, H, W = x.shape
    if frame_pool > 1:
        x = x.reshape(B, F // frame_pool, frame_pool, C, H, W).mean(2)
    T, g = x.shape[1], grid
    x = x.reshape(B, T, C, g, H // g, g, W // g).mean(axis=(4, 6))  # [B,T,C,g,g]
    x = np.transpose(x, (0, 1, 3, 4, 2)).reshape(B, T * g * g, C)
    return x @ mix


def _make_ref_tower(base_video, identifier, num_frames, frame_pool, grid, dim, image_size):
    class RefStubTower(base_video.VideoBackbone):
        def __init__(self):
            super().__init__(identifier, "resize-naive", default_image_size=image_size, num_frames=num_frames)
            self.register_buffer("mix", torch.from_numpy(_mix_matrix(dim)))

        def forward(self, video_values, is_image):
            x = video_values.float()
            B, F, C, H, W = x.shape
            if frame_pool > 1:
                x = x.reshape(B, F // frame_pool, frame_pool, C, H, W).mean(2)
            T, g = x.shape[1], grid
            x = x.reshape(B, T, C, g, H // g, g, W // g).mean(dim=(4, 6))
            x = x.permute(0, 1, 3, 4, 2).reshape(B, T * g * g, C)
            feats = x @ self.mix
            if is_image is not None:
                feats = torch.where(is_image.view(-1, 1, 1), feats * 2.0, feats)
            return feats

        def get_fsdp_wrapping_policy(self):
            return None

        @property
        def default_video_resolution(self):
            return (num_frames, 3, image_size, image_size)

        @property
        def embed_dim(self):
            return dim

        @property
        def num_patches(self):
            return (num_frames // frame_pool) * grid * grid

        @property
        def spatial_resolution(self):
            return grid * grid

        @property
        def half_precision_dtype(self):
            return torch.float32

    return RefStubTower()


class JaxStubTower(OurVideoBackbone):
    def __init__(self, identifier, num_frames, frame_pool, grid, dim, image_size):
        super().__init__(identifier, "resize-naive", default_image_size=image_size, num_frames=num_frames)
        self._frame_pool, self._grid, self._dim, self._image = frame_pool, grid, dim, image_size
        self._mix = jnp.asarray(_mix_matrix(dim))

    @property
    def vit_config(self):  # stub tower has no ViT
        return None

    def init(self, key):
        return {}

    def __call__(self, params, video_values, is_image=None):
        x = video_values.astype(jnp.float32)
        B, F, C, H, W = x.shape
        if self._frame_pool > 1:
            x = x.reshape(B, F // self._frame_pool, self._frame_pool, C, H, W).mean(2)
        T, g = x.shape[1], self._grid
        x = x.reshape(B, T, C, g, H // g, g, W // g).mean(axis=(4, 6))
        x = jnp.transpose(x, (0, 1, 3, 4, 2)).reshape(B, T * g * g, C)
        feats = x @ self._mix
        if is_image is not None:
            feats = jnp.where(is_image.reshape(-1, 1, 1), feats * 2.0, feats)
        return feats

    @property
    def default_video_resolution(self):
        return (self.num_frames, 3, self._image, self._image)

    @property
    def embed_dim(self):
        return self._dim

    @property
    def num_patches(self):
        return (self.num_frames // self._frame_pool) * self._grid ** 2

    @property
    def spatial_resolution(self):
        return self._grid ** 2

    @property
    def half_precision_dtype(self):
        return jnp.float32


# ---------------------------------------------------------------------------
# Reference stub LLM backbone wrapping a tiny real HF Llama
# ---------------------------------------------------------------------------

TINY = DecoderConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=3,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    max_position_embeddings=512,
    rope_theta=10000.0,
    compute_dtype=jnp.float32,
)


def _hf_llama(cfg: DecoderConfig):
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_norm_eps, attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return LlamaForCausalLM(hf_cfg).eval()


class _StubTokenizer:
    pad_token_id = 0

    def __init__(self, has_bos=True):
        self.bos_token = "<s>" if has_bos else None

    def encode(self, s, add_special_tokens=False):
        return [7]  # MCQ-letter contract: every trigger string is one token


def _make_ref_llm(base_llm, hf_model, has_bos=True):
    class RefStubLLM(base_llm.LLMBackbone):
        def __init__(self):
            super().__init__("stub-llm")
            self.llm = hf_model
            self.tokenizer = _StubTokenizer(has_bos=has_bos)

        def get_fsdp_wrapping_policy(self):
            return None

        def enable_gradient_checkpointing(self):
            pass

        def forward(self, input_ids=None, attention_mask=None, position_ids=None,
                    past_key_values=None, inputs_embeds=None, labels=None, use_cache=None,
                    output_attentions=None, output_hidden_states=None, return_dict=None):
            return self.llm(
                input_ids=input_ids, attention_mask=attention_mask, position_ids=position_ids,
                past_key_values=past_key_values, inputs_embeds=inputs_embeds, labels=labels,
                use_cache=use_cache, output_attentions=output_attentions,
                output_hidden_states=output_hidden_states, return_dict=return_dict,
            )

        def embed_input_ids(self, input_ids):
            return self.llm.get_input_embeddings()(input_ids)

        @property
        def prompt_builder_fn(self):
            return None

        @property
        def transformer_layer_cls(self):
            return torch.nn.Module

        @property
        def half_precision_dtype(self):
            return torch.float32

    return RefStubLLM()


def _our_llm(has_bos=True):
    spec = LLMSpec(
        llm_family="tiny", hf_hub_path="__offline__/tiny", decoder_config=TINY,
        prompt_builder_cls=PurePromptBuilder, has_bos=has_bos, pad_token_id=0, eos_token_id=2,
    )
    return OurLLMBackbone("stub-llm", llm_max_length=TINY.max_position_embeddings, spec=spec)


# ---------------------------------------------------------------------------
# Pair construction + comparison driver
# ---------------------------------------------------------------------------

TOWER_SPECS = [
    # (identifier, num_frames, frame_pool, grid, dim, image_size)
    ("stub-a", 4, 1, 2, 16, 16),   # temporal 4, spatial 4 (2x2), like a per-frame ViT
    ("stub-b", 8, 2, 3, 24, 18),   # temporal 4 via tubelet-2, spatial 9 (3x3), ViViT-like
]


def _build_pair(arch, fusion, has_bos=True, vfl=16, ptl=4):
    ref_merv, base_video, base_llm = _load_reference_merv()
    hf = _hf_llama(TINY)

    ref_towers = [_make_ref_tower(base_video, *spec) for spec in TOWER_SPECS]
    ref_model = ref_merv.MERV(
        "tiny-xstack", ref_towers, _make_ref_llm(base_llm, hf, has_bos=has_bos),
        arch_specifier=arch, feature_fusion=fusion,
        projector_token_length=ptl, visual_feature_length=vfl,
    ).eval().float()

    our_towers = [JaxStubTower(*spec) for spec in TOWER_SPECS]
    our_model = OurMERV(
        "tiny-xstack", our_towers, _our_llm(has_bos=has_bos),
        arch_specifier=arch, feature_fusion=fusion,
        projector_token_length=ptl, visual_feature_length=vfl,
        text_embedding_dim=3072,  # the reference hardcodes 3072 (merv.py:215)
    )

    # shared weights: reference state dicts -> our pytrees, via the production
    # checkpoint importer (reference save layout fsdp.py:111-142)
    ckpt = {"model": {
        "projectors": {k: v for k, v in ref_model.projectors.state_dict().items()},
        "feature_fusion": (ref_model.feature_fusion.state_dict() if ref_model.feature_fusion is not None else {}),
        "llm_backbone": {"llm." + k: v for k, v in hf.state_dict().items()},
    }}
    params = import_merv_checkpoint(our_model, ckpt, param_dtype=jnp.float32, llm_param_dtype=jnp.float32)
    params["llm_backbone"] = import_llama_state_dict(TINY, hf.state_dict(), param_dtype=jnp.float32)
    params["video_backbones"] = {str(i): {} for i in range(len(our_towers))}
    return ref_model, our_model, params


def _mixed_batch(has_labels=True, T=9, seed=0):
    rng = np.random.RandomState(seed)
    B = 4
    input_ids = rng.randint(3, TINY.vocab_size, size=(B, T)).astype(np.int64)
    input_ids[:, 0] = 1  # BOS
    attention_mask = np.ones((B, T), np.int64)
    attention_mask[3, -3:] = 0  # row 3: right-padded
    input_ids[3, -3:] = 0
    labels = np.where(attention_mask == 1, input_ids, IGNORE_INDEX)
    labels[:, 0] = IGNORE_INDEX
    videos = [rng.randn(B, f, 3, s, s).astype(np.float32)
              for (_, f, _, _, _, s) in TOWER_SPECS]
    multimodal_indices = np.array([0, 2, 3], np.int64)  # row 1 is unimodal text
    is_image = np.array([False, False, True, False])    # row 2 is an inflated image
    return input_ids, attention_mask, (labels if has_labels else None), videos, multimodal_indices, is_image


def _run_ref(ref_model, input_ids, attention_mask, labels, videos, mm_idx, is_image):
    with torch.no_grad():
        out = ref_model.forward(
            input_ids=torch.from_numpy(input_ids),
            attention_mask=torch.from_numpy(attention_mask),
            video_values=[torch.from_numpy(v) for v in videos],
            labels=None if labels is None else torch.from_numpy(labels),
            is_image=torch.from_numpy(is_image),
            multimodal_indices=torch.from_numpy(mm_idx),
        )
    return out


def _run_ours(our_model, params, input_ids, attention_mask, labels, videos, mm_idx, is_image):
    B = input_ids.shape[0]
    is_mm = np.zeros(B, bool)
    is_mm[mm_idx] = True
    return our_model.forward(
        params, jnp.asarray(input_ids), jnp.asarray(attention_mask),
        [jnp.asarray(v) for v in videos],
        labels=None if labels is None else jnp.asarray(labels),
        is_image=jnp.asarray(is_image), is_multimodal=jnp.asarray(is_mm),
    )


def _assert_parity(ref_out, our_out, mm_idx, B, atol=1e-4):
    """Compare logits at valid positions, honoring the reference's
    multimodal-first row reorder (merv.py:666-719 vstack)."""
    ref_logits = ref_out.logits.float().numpy()
    our_logits = np.asarray(our_out["logits"], np.float32)
    our_mask = np.asarray(our_out["attention_mask"], bool)

    uni = [i for i in range(B) if i not in set(mm_idx.tolist())]
    order = list(mm_idx.tolist()) + uni  # ref row k == our row order[k]
    for k, i in enumerate(order):
        valid = our_mask[i]
        diff = np.abs(ref_logits[k][valid] - our_logits[i][valid]).max()
        assert diff < atol, f"row {i}: max logit diff {diff}"


def test_flagship_composition_mixed_batch():
    """merv-base analogue: 3davg+linear + cross_attention_avg_lq, batch mixing
    multimodal / unimodal / image-flagged / padded rows, with loss."""
    ref_model, our_model, params = _build_pair("no-align+3davg+linear", "cross_attention_avg_lq")
    batch = _mixed_batch()
    ref_out = _run_ref(ref_model, *batch)
    our_out = _run_ours(our_model, params, *batch)
    _assert_parity(ref_out, our_out, batch[4], B=4)
    ref_loss = float(ref_out.loss)
    our_loss = float(our_out["loss"])
    assert abs(ref_loss - our_loss) < 1e-4 * max(1.0, abs(ref_loss)), (ref_loss, our_loss)
    # fusion mixing weights also cross-check (mixer is part of the contract)
    assert our_out["mixer"] is not None


def test_all_multimodal_no_labels():
    ref_model, our_model, params = _build_pair("no-align+3davg+linear", "cross_attention_avg_lq")
    input_ids, attention_mask, _, videos, _, is_image = _mixed_batch(has_labels=False)
    mm_idx = np.arange(4, dtype=np.int64)
    ref_out = _run_ref(ref_model, input_ids, attention_mask, None, videos, mm_idx, is_image)
    our_out = _run_ours(our_model, params, input_ids, attention_mask, None, videos, mm_idx, is_image)
    _assert_parity(ref_out, our_out, mm_idx, B=4)
    assert ref_out.loss is None and our_out["loss"] is None


def test_concat_channel_ln_avg_mlp():
    """Second arch point: avg+gelu-mlp projectors + Sequential(LN, Linear) fusion."""
    ref_model, our_model, params = _build_pair("avg+gelu-mlp", "concat_channel_ln")
    batch = _mixed_batch(seed=1)
    ref_out = _run_ref(ref_model, *batch)
    our_out = _run_ours(our_model, params, *batch)
    _assert_parity(ref_out, our_out, batch[4], B=4)
    assert abs(float(ref_out.loss) - float(our_out["loss"])) < 1e-4 * max(1.0, abs(float(ref_out.loss)))


def test_flagship_gradient_parity():
    """Cross-stack GRADIENT parity: ``torch.autograd`` through the reference's
    composed ``MERV.forward`` loss vs ``jax.grad`` of ours, on shared weights
    (reference training semantics ``merv/training/strategies/base_strategy.py:
    208-271`` reduce to mean-CE backprop per micro-batch; freezing and
    accumulation are pinned by our own training tests). The reference
    gradients route back through our production importers — they are linear
    maps (transposes/reshapes), so a gradient state dict converts exactly
    like a weight state dict. A sign error or wrong projection in ANY module
    (projector, fusion, splice, decoder, lm head) would show here."""
    ref_model, our_model, params = _build_pair("no-align+3davg+linear", "cross_attention_avg_lq")
    input_ids, attention_mask, labels, videos, mm_idx, is_image = _mixed_batch()

    # --- reference side: backprop the composed loss
    out = ref_model.forward(
        input_ids=torch.from_numpy(input_ids),
        attention_mask=torch.from_numpy(attention_mask),
        video_values=[torch.from_numpy(v) for v in videos],
        labels=torch.from_numpy(labels),
        is_image=torch.from_numpy(is_image),
        multimodal_indices=torch.from_numpy(mm_idx),
    )
    out.loss.backward()

    def grad_dict(module):
        return {
            k: (p.grad if p.grad is not None else torch.zeros_like(p)).detach().clone()
            for k, p in module.named_parameters()
        }

    hf = ref_model.llm_backbone.llm
    gckpt = {"model": {
        "projectors": grad_dict(ref_model.projectors),
        "feature_fusion": grad_dict(ref_model.feature_fusion),
    }}
    ref_grads = import_merv_checkpoint(
        our_model, gckpt, param_dtype=jnp.float32, llm_param_dtype=jnp.float32
    )
    ref_grads["llm_backbone"] = import_llama_state_dict(
        TINY, grad_dict(hf), param_dtype=jnp.float32
    )

    # --- our side: jax.grad of the same loss on the same weights
    B = input_ids.shape[0]
    is_mm = np.zeros(B, bool)
    is_mm[mm_idx] = True

    def loss_fn(p):
        o = our_model.forward(
            p, jnp.asarray(input_ids), jnp.asarray(attention_mask),
            [jnp.asarray(v) for v in videos], labels=jnp.asarray(labels),
            is_image=jnp.asarray(is_image), is_multimodal=jnp.asarray(is_mm),
        )
        return o["loss"]

    our_grads = jax.grad(loss_fn)(params)

    # --- compare per module, relative to each tensor's own gradient scale
    def check(ref_tree, our_tree, name):
        ref_leaves, treedef_r = jax.tree_util.tree_flatten_with_path(ref_tree)
        our_map = dict(jax.tree_util.tree_flatten_with_path(our_tree)[0])
        assert ref_leaves, name
        for path, g_ref in ref_leaves:
            g_ref = np.asarray(g_ref, np.float64)
            g_our = np.asarray(our_map[path], np.float64)
            assert g_ref.shape == g_our.shape, (name, path)
            scale = max(1e-6, np.abs(g_ref).max())
            diff = np.abs(g_ref - g_our).max()
            assert diff <= 1e-4 * max(1.0, scale), (
                f"{name}{jax.tree_util.keystr(path)}: grad diff {diff} (scale {scale})"
            )

    check(ref_grads["projectors"], our_grads["projectors"], "projectors")
    check(ref_grads["feature_fusion"], our_grads["feature_fusion"], "feature_fusion")
    check(ref_grads["llm_backbone"], our_grads["llm_backbone"], "llm_backbone")


def test_no_bos_splice():
    """Qwen-style bos_token_length == 0: visual tokens spliced at position 0
    (reference merv.py:521,633-650)."""
    ref_model, our_model, params = _build_pair("no-align+3davg+linear", "cross_attention_avg_lq", has_bos=False)
    input_ids, attention_mask, labels, videos, mm_idx, is_image = _mixed_batch(seed=2)
    input_ids[:, 0] = 5  # no BOS token in the stream
    ref_out = _run_ref(ref_model, input_ids, attention_mask, labels, videos, mm_idx, is_image)
    our_out = _run_ours(our_model, params, input_ids, attention_mask, labels, videos, mm_idx, is_image)
    _assert_parity(ref_out, our_out, mm_idx, B=4)
