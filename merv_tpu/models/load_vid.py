"""Pretrained-model loading (parity: reference ``merv/models/load_vid.py:30-127``).

``load_vid(id_or_path)`` accepts:
- a local run directory containing ``config.json`` + either an Orbax
  checkpoint dir (``checkpoints/latest-checkpoint``) or a reference-format
  torch ``checkpoints/latest-checkpoint.pt``;
- a registry id / name (``merv-full``, "MERV Full", ...) — downloads from the
  HF Hub repo ``tyleryzhu/merv`` when network access is available.

Returns ``(vidlm, params)`` — the functional analogue of the reference's
stateful module (explicit params instead of loaded buffers). Vision-tower
weights come from timm/HF checkpoints (reference loads them the same way);
offline runs without cached tower weights fall back to random towers with a
loud warning (structure + speed testing only).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import jax

from merv_tpu.conf import ModelConfig, ModelRegistry
from merv_tpu.models.ckpt_import import import_merv_checkpoint
from merv_tpu.models.materialize import (
    get_llm_backbone_and_tokenizer,
    get_video_backbone_and_transform,
    get_vidlm,
)
from merv_tpu.models.registry import GLOBAL_REGISTRY, MODEL_REGISTRY
from merv_tpu.overwatch import initialize_overwatch
from merv_tpu.training.checkpointing import latest_checkpoint, load_checkpoint

overwatch = initialize_overwatch(__name__)

HF_HUB_REPO = "tyleryzhu/merv"


def available_models() -> List[str]:
    return list(MODEL_REGISTRY.keys())


def available_model_names() -> List[str]:
    return list(GLOBAL_REGISTRY.items())


def get_model_description(model_id_or_name: str) -> str:
    if model_id_or_name not in GLOBAL_REGISTRY:
        raise ValueError(f"Couldn't find `{model_id_or_name = }; check `merv_tpu.available_model_names()`")
    print(json.dumps(description := GLOBAL_REGISTRY[model_id_or_name]["description"], indent=2))
    return description


def _load_tower_params(vidlm, key, allow_random: bool) -> Dict[str, Any]:
    """Pretrained tower weights; random init only when explicitly allowed."""
    towers: Dict[str, Any] = {}
    keys = jax.random.split(key, len(vidlm.video_backbones))
    for i, (vb, k) in enumerate(zip(vidlm.video_backbones, keys)):
        loaded = None
        try:
            from merv_tpu.models.backbones.video.vision_import import load_pretrained_tower

            loaded = load_pretrained_tower(vb)
        except Exception as e:
            if not allow_random:
                raise RuntimeError(
                    f"Pretrained weights for tower {vb.identifier!r} unavailable "
                    f"({type(e).__name__}: {e}). Run scripts/export_towers.py to populate "
                    f"$MERV_TPU_TOWER_DIR, or pass allow_random_weights=True for "
                    f"structure/speed testing (outputs will be meaningless)."
                ) from e
            overwatch.warning(
                f"Pretrained weights for {vb.identifier} unavailable ({type(e).__name__}); RANDOM init "
                f"— outputs are meaningless (structure/speed testing only)", ctx_level=1
            )
        towers[str(i)] = loaded if loaded is not None else vb.init(k)
    return towers


def _tensor_axis_active(mesh: Optional[Any] = None) -> bool:
    """True when ``mesh`` (or, failing that, any scoped activation mesh) has a
    tensor-parallel axis > 1."""
    from merv_tpu.parallel.mesh import TENSOR_AXIS
    from merv_tpu.parallel import sharding as _sh

    mesh = mesh if mesh is not None else _sh.get_activation_mesh()
    return mesh is not None and mesh.shape.get(TENSOR_AXIS, 1) > 1


def load_vid(
    model_id_or_path: Union[str, Path],
    hf_token: Optional[str] = None,
    cache_dir: Optional[Union[str, Path]] = None,
    get_model_cfg: bool = False,
    quantize_llm: bool = False,
    allow_random_weights: bool = False,
    pack_llm: bool = True,
    mesh: Optional[Any] = None,
):
    """Load a pretrained MERV -> (vidlm, params) [+ model_cfg].

    ``quantize_llm=True`` converts the LLM kernels to the weight-only int8
    serving layout (see merv_tpu/nn/quantization.py) — halves weight HBM, the
    mode that fits full llama2-7b decode on a single v5e.

    ``pack_llm=True`` (default) stores q/k/v and gate/up as single packed GEMM
    kernels (``pack_serving_params``) — one wide MXU GEMM instead of three
    narrow ones, +1.4% measured prefill throughput, numerically identical to
    GEMM-tiling rounding. Disable when the param tree must keep the training
    layout (e.g. to re-export or continue training from the loaded state).

    ``mesh``: the ``jax.sharding.Mesh`` the returned params will be served on
    (multi-chip serving — SERVING.md). Packing auto-disables when it has a
    tensor axis > 1: the TP sharding rules key on unpacked q/k/v paths, and a
    packed tree would silently fall back to fully-replicated LLM weights.

    ``allow_random_weights=True`` permits random-init fallback for missing
    tower/base-LLM weights (structure + throughput testing only). The default
    raises so eval runs can never silently produce garbage accuracies.
    """
    if os.path.isdir(model_id_or_path):
        run_dir = Path(model_id_or_path)
        overwatch.info(f"Loading from local path `{run_dir}`")
        config_json = run_dir / "config.json"
        assert config_json.exists(), f"Missing `config.json` for `{run_dir = }`"
        checkpoint = run_dir / "checkpoints" / "latest-checkpoint.pt"
        if not checkpoint.exists():
            checkpoint = latest_checkpoint(run_dir)
        assert checkpoint is not None and Path(checkpoint).exists(), "Missing checkpoint!"
    else:
        if model_id_or_path not in GLOBAL_REGISTRY:
            raise ValueError(f"Couldn't find `{model_id_or_path = }; check `merv_tpu.available_model_names()`")
        model_id = GLOBAL_REGISTRY[model_id_or_path]["model_id"]
        overwatch.info(f"Downloading `{model_id}` from HF Hub")
        from huggingface_hub import hf_hub_download

        config_json = Path(hf_hub_download(repo_id=HF_HUB_REPO, filename=f"{model_id}/config.json", cache_dir=cache_dir))
        checkpoint = Path(
            hf_hub_download(
                repo_id=HF_HUB_REPO, filename=f"{model_id}/checkpoints/latest-checkpoint.pt", cache_dir=cache_dir
            )
        )

    with open(config_json, "r") as f:
        model_cfg_dict = json.load(f)["model"]
        model_cfg_dict.pop("vidlm_id", None)
        model_cfg_dict.pop("type", None)
        model_cfg = ModelConfig.get_choice_class(ModelRegistry.MERV_BASE.model_id)(**model_cfg_dict)

    overwatch.info(
        f"Found Config =>> Loading & Freezing {model_cfg.model_id} with:\n"
        f"             Video Backbones =>> {model_cfg.video_backbone_ids}\n"
        f"             LLM Backbone    =>> {model_cfg.llm_backbone_id}\n"
        f"             Arch Specifier  =>> {model_cfg.arch_specifier}\n"
        f"             Checkpoint Path =>> `{checkpoint}`"
    )

    video_backbones, _ = get_video_backbone_and_transform(
        model_cfg.video_backbone_ids,
        image_resize_strategy=model_cfg.image_resize_strategy,
        num_frames=model_cfg.num_frames,
    )
    llm_backbone, _tokenizer = get_llm_backbone_and_tokenizer(
        model_cfg.llm_backbone_id, llm_max_length=model_cfg.llm_max_length, hf_token=hf_token, inference_mode=True
    )

    vidlm = get_vidlm(
        model_cfg.model_id,
        model_cfg.arch_specifier,
        model_cfg.feature_fusion,
        video_backbones,
        llm_backbone,
        projector_token_length=model_cfg.projector_token_length,
        visual_feature_length=model_cfg.visual_feature_length,
    )

    # === assemble params: checkpoint (trainables) + pretrained towers/LLM ===
    # Order and fusion are HBM-critical on a 16 GB chip: the 7B LLM is
    # assembled FIRST and in ONE donated jit (cast -> pack -> quantize, with
    # random-init traced inside when weights are missing) so XLA's liveness
    # analysis frees every intermediate — a chain of separate jits holds full
    # input+output trees simultaneously (2 x 13.4 GB) and OOMs. Towers load
    # after, beside the final (possibly int8-halved) LLM tree.
    import jax.numpy as jnp

    key = jax.random.PRNGKey(7)
    if str(checkpoint).endswith(".pt"):
        restored = import_merv_checkpoint(vidlm, checkpoint)
    else:
        restored = load_checkpoint(Path(checkpoint))["model"]

    def _assemble_llm(tree):
        """cast to serving dtype -> packed layout -> int8; traced as ONE program."""
        serve_dtype = llm_backbone.half_precision_dtype
        tree = jax.tree_util.tree_map(
            lambda x: x.astype(serve_dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
        )
        if pack_llm and _tensor_axis_active(mesh):
            # the TP rule table (parallel/sharding.py) keys on UNPACKED q/k/v
            # paths; a packed tree under tensor>1 would silently fall back to
            # fully-replicated LLM weights (memory blow-up), so packing
            # auto-disables rather than relying on a docstring note
            overwatch.info("Mesh has tensor>1: disabling packed serving layout (TP rules key on unpacked paths)")
        elif pack_llm:
            from merv_tpu.models.backbones.llm.transformer import pack_serving_params

            tree = pack_serving_params(tree)
        if quantize_llm:
            from merv_tpu.nn.quantization import quantize_tree

            tree = quantize_tree(tree)
        return tree

    llm_source = restored.get("llm_backbone")
    if llm_source is None:
        try:
            from merv_tpu.models.backbones.llm.hf_import import load_safetensors_dir

            llm_dir = os.environ.get("MERV_TPU_LLM_DIR")
            assert llm_dir, "set MERV_TPU_LLM_DIR to a local safetensors dir for base LLM weights"
            llm_source = llm_backbone.load_state_dict(load_safetensors_dir(Path(llm_dir)))
        except Exception as e:
            if not allow_random_weights:
                raise RuntimeError(
                    f"Base LLM weights unavailable ({type(e).__name__}: {e}). Set MERV_TPU_LLM_DIR "
                    f"to a local safetensors dir, or pass allow_random_weights=True for "
                    f"structure/speed testing (outputs will be meaningless)."
                ) from e
            overwatch.warning(
                f"Base LLM weights unavailable ({type(e).__name__}); RANDOM init — outputs are "
                f"meaningless (structure/speed testing only)", ctx_level=1
            )

    if llm_source is None:
        # random fallback: init INSIDE the assemble jit — the bf16 tree is a
        # liveness-managed transient, never a held buffer
        llm_params = jax.jit(lambda k: _assemble_llm(llm_backbone.decoder.init(k)))(key)
    else:
        # host-resident sources (CPU-restored checkpoints, numpy state dicts)
        # downcast ON HOST before the device transfer — uploading an fp32 7B
        # tree (27 GB) would OOM HBM before the assemble jit could cast it
        import numpy as np

        backend = jax.default_backend()

        def _host_half(x):
            if isinstance(x, jax.Array) and next(iter(x.devices())).platform == backend:
                return x  # already on the accelerator; the assemble jit casts it
            arr = np.asarray(x)  # host view — never a device transfer here
            if not jnp.issubdtype(arr.dtype, jnp.floating):
                return arr
            return arr.astype(llm_backbone.half_precision_dtype)

        llm_source = jax.tree_util.tree_map(_host_half, llm_source)
        llm_params = jax.jit(_assemble_llm, donate_argnums=0)(llm_source)
        del llm_source

    def _to_default_device(tree):
        """Move host/CPU-committed leaves to the default accelerator.

        Orbax's cross-platform fallback restores onto CPU devices and those
        arrays stay COMMITTED there; a jit over CPU-committed inputs compiles
        the whole serving program for the CPU backend (where the Pallas
        kernels refuse to run and a 7B forward takes minutes per token).
        Leaves already on the accelerator pass through untouched.
        """
        import numpy as np

        backend = jax.default_backend()

        def fix(x):
            if isinstance(x, jax.Array) and next(iter(x.devices())).platform == backend:
                return x
            return jnp.asarray(np.asarray(x))

        return jax.tree_util.tree_map(fix, tree)

    params: Dict[str, Any] = {
        "projectors": _to_default_device(restored["projectors"]),
        "feature_fusion": _to_default_device(restored.get("feature_fusion", {})),
        "llm_backbone": llm_params,
        "video_backbones": _to_default_device(_load_tower_params(vidlm, key, allow_random_weights)),
    }
    for i, vb in enumerate(vidlm.video_backbones):
        # frozen towers hard-cast to half precision, the reference's
        # `.to(half_precision_dtype)` contract (fsdp.py:212-230)
        params["video_backbones"][str(i)] = jax.jit(
            lambda t, d=vb.half_precision_dtype: jax.tree_util.tree_map(
                lambda x: x.astype(d) if jnp.issubdtype(x.dtype, jnp.floating) else x, t
            ),
            donate_argnums=0,
        )(params["video_backbones"][str(i)])

    if mesh is not None:
        # place the tree on the serving mesh: a jit whose trace carries mesh
        # sharding constraints (sp-sharded cache, TP) REJECTS args committed
        # to a single device ("incompatible devices"). Weights REPLICATE over
        # the mesh (serving wants no per-layer weight all-gathers; the memory
        # that matters at long context is the cache, which shards via
        # constrain_cache_seq) — except under tensor>1, where the LLM subtree
        # takes the Megatron column/row splits.
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        if _tensor_axis_active(mesh):
            from merv_tpu.parallel import llm_tensor_parallel_rules
            from merv_tpu.parallel.sharding import path_str

            rules = llm_tensor_parallel_rules()

            def _spec(path, leaf):
                s = rules.spec_for(path_str(path), leaf)
                return NamedSharding(mesh, s if s is not None else P())

            params["llm_backbone"] = jax.device_put(
                params["llm_backbone"],
                jax.tree_util.tree_map_with_path(_spec, params["llm_backbone"]),
            )
        else:
            params["llm_backbone"] = jax.device_put(params["llm_backbone"], repl)
        for k in ("projectors", "feature_fusion", "video_backbones"):
            params[k] = jax.device_put(params[k], repl)

    if get_model_cfg:
        return vidlm, params, model_cfg
    return vidlm, params
