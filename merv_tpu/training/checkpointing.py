"""Checkpoint save / load / resume (Orbax).

Layout parity with the reference FSDP checkpointer (reference
``merv/training/strategies/fsdp.py:95-142``): module-keyed ``model`` tree
(only trainable keys by default), ``optimizer`` state, ``step``/``epoch``
metadata, directory name ``step-{:06d}-epoch-{:02d}-loss={:.4f}`` plus a
``latest-checkpoint`` pointer.

TPU-native: Orbax writes each checkpoint as a directory of sharded arrays
directly from device memory (no rank-0 CPU offload barrier — the reference's
FULL_STATE_DICT gather, ``fsdp.py:95-111``, is unnecessary under SPMD);
step/epoch live in a sidecar ``meta.json`` as well as the dirname.
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax

from merv_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)

PyTree = Any

_CKPT_RE = re.compile(r"step-(\d+)-epoch-(\d+)-loss=([0-9.]+)")


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


# -- async checkpointing (Orbax AsyncCheckpointer) --------------------------------
# The finetune stage's trainables are the full 7B LLM + projectors: a blocking
# save stalls the train loop for the entire serialize+write every
# `save_checkpoint_after` steps. The async path returns as soon as the device
# arrays are snapshotted to host; the write happens in a background thread.
# meta.json and the `latest-checkpoint` pointer are deferred until the write
# COMMITS (wait_for_checkpoints) so a crash mid-write can never leave
# `latest-checkpoint` pointing at a torn directory.
_async_ckptr = None
_pending: Optional[Tuple[Path, Dict[str, Any]]] = None


def _async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp

        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def _finalize(target: Path, meta: Dict[str, Any]) -> None:
    with open(target / "meta.json", "w") as f:
        json.dump(meta, f)
    latest = target.parent / "latest-checkpoint"
    if latest.is_symlink() or latest.exists():
        latest.unlink() if latest.is_symlink() else shutil.rmtree(latest)
    latest.symlink_to(target.name)
    overwatch.info(f"Saved checkpoint {target}")


def wait_for_checkpoints() -> None:
    """Block until any in-flight async save commits, then finalize its
    meta.json + latest-checkpoint pointer. Call before reading a checkpoint
    just saved async, and at the end of training."""
    global _pending
    if _pending is None:
        return
    target, meta = _pending
    _pending = None
    _async_checkpointer().wait_until_finished()
    _finalize(target, meta)


def save_checkpoint(
    run_dir: Path,
    step: int,
    epoch: int,
    loss: float,
    params: PyTree,
    trainable_keys: List[str],
    opt_state: Optional[PyTree] = None,
    only_trainable: bool = True,
    blocking: bool = True,
) -> Path:
    """Write `checkpoints/step-...-loss=.../` + refresh `latest-checkpoint`.

    ``blocking=False`` hands the write to a background thread (at most one in
    flight: a new save first waits for the previous) and defers meta/pointer
    finalization to :func:`wait_for_checkpoints` / the next save.
    """
    global _pending
    ckpt_root = Path(run_dir) / "checkpoints"
    ckpt_root.mkdir(parents=True, exist_ok=True)
    name = f"step-{step:06d}-epoch-{epoch:02d}-loss={loss:.4f}"
    target = ckpt_root / name

    model = {k: v for k, v in params.items() if (not only_trainable) or k in trainable_keys}
    tree: Dict[str, Any] = {"model": model}
    if opt_state is not None:
        tree["optimizer"] = opt_state

    meta = {"step": step, "epoch": epoch, "loss": loss, "module_keys": sorted(model.keys())}
    # serialize against any in-flight async save (and finalize it) FIRST, in
    # both modes — a blocking save racing a pending async one would otherwise
    # let the later wait_for_checkpoints() repoint latest-checkpoint BACKWARD
    wait_for_checkpoints()
    if not blocking:
        if target.exists():
            shutil.rmtree(target)
        _async_checkpointer().save(target.resolve(), tree)
        _pending = (target, meta)
        overwatch.info(f"Async checkpoint {target} dispatched", ctx_level=1)
        return target

    ckptr = _checkpointer()
    if target.exists():
        shutil.rmtree(target)
    ckptr.save(target.resolve(), tree)
    ckptr.wait_until_finished()
    _finalize(target, meta)
    return target


def parse_checkpoint_name(path: Path) -> Tuple[int, int]:
    """(step, epoch) from the checkpoint dirname (reference fsdp.py:162-168)."""
    m = _CKPT_RE.search(Path(path).name)
    if m is None:
        meta = Path(path) / "meta.json"
        if meta.exists():
            d = json.loads(meta.read_text())
            return int(d["step"]), int(d["epoch"])
        raise ValueError(f"cannot parse step/epoch from {path}")
    return int(m.group(1)), int(m.group(2))


def latest_checkpoint(run_dir: Path) -> Optional[Path]:
    latest = Path(run_dir) / "checkpoints" / "latest-checkpoint"
    if latest.exists():
        return latest.resolve()
    # fallback scan accepts only COMMITTED checkpoints: meta.json is written
    # at finalize, after the (possibly async) Orbax write commits — a crash
    # mid-write leaves a torn step dir / Orbax tmp dir without it
    candidates = sorted(
        (p for p in Path(run_dir, "checkpoints").glob("step-*") if (p / "meta.json").exists()),
        key=lambda p: p.name,
    )
    return candidates[-1] if candidates else None


def _metadata_tree(ckptr: Any, path: Path) -> PyTree:
    """Checkpoint metadata -> a tree of objects with .shape/.dtype.

    The attribute chain differs across Orbax versions
    (``metadata(path).item_metadata.tree`` on current releases, the metadata
    object itself being the tree on older ones) — probe the known layouts so
    the cross-platform recovery path degrades with a clear error instead of
    an AttributeError deep in the fallback it exists to serve.
    """
    meta = ckptr.metadata(path)
    for attr_chain in (("item_metadata", "tree"), ("item_metadata",), ("tree",)):
        node = meta
        for a in attr_chain:
            node = getattr(node, a, None)
            if node is None:
                break
        if node is not None:
            return node
    if isinstance(meta, dict) or hasattr(meta, "keys"):
        return meta
    raise RuntimeError(
        f"Unrecognized Orbax metadata layout for {path}: {type(meta).__name__} "
        "(expected .item_metadata.tree / .item_metadata / .tree / mapping); "
        "pass an explicit `target` to load_checkpoint"
    )


def load_checkpoint(
    path: Path,
    target: Optional[PyTree] = None,
) -> Dict[str, Any]:
    """Restore a checkpoint dir -> {"model": ..., "optimizer": ..., step, epoch}.

    ``target`` (an abstract/eval_shape'd tree of the same structure) restores
    exact dtypes/structures incl. optax namedtuples; without it, plain nested
    dicts of arrays are returned (fine for model-only loads).

    Checkpoints are PORTABLE across platforms: Orbax records the saving
    devices' shardings, so a no-target restore of a CPU-saved checkpoint on
    TPU (or vice versa) would fail with "Device ... not found"; when that
    happens we rebuild an abstract target from the checkpoint metadata with
    the current default device and retry.
    """
    path = Path(path).resolve()
    ckptr = _checkpointer()
    step, epoch = parse_checkpoint_name(path)
    try:
        tree = ckptr.restore(path, target) if target is not None else ckptr.restore(path)
    except ValueError as e:
        if "not found in jax.local_devices" not in str(e):
            raise
        import jax as _jax
        from jax.sharding import SingleDeviceSharding

        meta_tree = target if target is not None else _metadata_tree(ckptr, path)
        # restore onto HOST memory, not the accelerator: a finetune-stage
        # checkpoint holds the full fp32 LLM (27 GB for 7B) which must never
        # be materialized in HBM — load_vid downcasts on host before transfer
        sharding = SingleDeviceSharding(_jax.local_devices(backend="cpu")[0])
        abstract = _jax.tree_util.tree_map(
            lambda m: _jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
            meta_tree,
        )
        tree = ckptr.restore(path, abstract)
    out = dict(tree)
    out["step"], out["epoch"] = step, epoch
    return out


def discover_align_checkpoint(run_dir: Path) -> Path:
    """Finetune->align run-dir substitution (reference merv.py:450-463)."""
    run_dir = Path(run_dir)
    model, scale, _, seed = run_dir.name.split("+")
    align_dirs = [
        d
        for d in run_dir.parent.iterdir()
        if d.name.startswith(f"{model}+{scale}") and d.name.endswith(f"+stage-align+{seed}")
    ]
    assert len(align_dirs) == 1, "Multiple or No Valid Pretrained Directories Exist -- Double Check `runs`!"
    ckpt = latest_checkpoint(align_dirs[0])
    if ckpt is None:
        raise ValueError(f"Could not find valid `align` checkpoint under {align_dirs[0]}!")
    return ckpt


def load_stage_weights(model: Any, params: PyTree, stage: str, run_dir: Path, pretrained_checkpoint: Optional[Path] = None) -> PyTree:
    """Stage-handoff weight loading (reference merv.py:389-463), functional form.

    Returns ``params`` with the appropriate modules replaced from checkpoint.
    """
    assert stage in {"align", "second_align", "full-align", "finetune", "full-finetune", "second_finetune"}, (
        f"Stage {stage} is not supported!"
    )
    if stage == "second_align":
        # second align round: continue projector/fusion training from an
        # explicit checkpoint (align semantics otherwise; the stage string is
        # accepted by freeze_backbones/materialize, merv.py:536)
        if pretrained_checkpoint is not None:
            restored = load_checkpoint(Path(pretrained_checkpoint))["model"]
            new_params = dict(params)
            new_params["projectors"] = restored["projectors"]
            if "feature_fusion" in restored:
                new_params["feature_fusion"] = restored["feature_fusion"]
            return new_params
        overwatch.info("Stage `second_align` without pretrained_checkpoint =>> fresh projector init", ctx_level=1)
        return params
    if model.arch_specifier.startswith("no-align"):
        overwatch.info(f"MERV with arch_specifier = {model.arch_specifier!r} does not require pretrained weights!", ctx_level=1)
        return params
    if stage in ("align", "full-align"):
        overwatch.info("Stage `align` does not require pretrained weights =>> Starting Training", ctx_level=1)
        return params

    overwatch.info("Stage `finetune` requires `align` pretrained weights", ctx_level=1)
    ckpt_path = Path(pretrained_checkpoint) if pretrained_checkpoint is not None else discover_align_checkpoint(run_dir)
    restored = load_checkpoint(ckpt_path)["model"]

    new_params = dict(params)
    new_params["projectors"] = restored["projectors"]
    if stage == "second_finetune" and pretrained_checkpoint is not None:
        assert "llm_backbone" in restored, "second_finetune expects `llm_backbone` in the checkpoint!"
        new_params["llm_backbone"] = restored["llm_backbone"]
        if model.feature_fusion is not None and "feature_fusion" in restored:
            new_params["feature_fusion"] = restored["feature_fusion"]
    return new_params
