"""Training entry point (parity: reference ``scripts/pretrain_video.py``).

Launch (single host; the mesh spans all local TPU chips automatically):

    python scripts/pretrain_video.py \
        --model.type merv-base \
        --model.num_frames [16,16,32,16] \
        --stage finetune

Multi-host: run once per host under `jax.distributed` env (JAX_COORDINATOR_ADDRESS
etc.) — the mesh then spans the full slice; there is no torchrun analogue
because XLA SPMD shards one program instead of running one process per chip.
"""

from __future__ import annotations

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from pathlib import Path


import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Tuple, Union

import merv_tpu.conf.registry as draccus
from merv_tpu.conf import DatasetConfig, DatasetRegistry, ModelConfig, ModelRegistry
from merv_tpu.models import get_llm_backbone_and_tokenizer, get_video_backbone_and_transform, get_vidlm
from merv_tpu.models.materialize import train_tower_scan_unroll
from merv_tpu.overwatch import initialize_overwatch
from merv_tpu.preprocessing import get_dataset_and_collator
from merv_tpu.training import Metrics, get_train_strategy
from merv_tpu.training.checkpointing import load_stage_weights
from merv_tpu.util.seed_utils import set_global_seed

overwatch = initialize_overwatch(__name__)


@dataclass
class PretrainConfig:
    # fmt: off
    model: ModelConfig = field(default_factory=ModelConfig.get_choice_class(ModelRegistry.MERV_BASE.model_id))
    dataset: DatasetConfig = field(default_factory=DatasetConfig.get_choice_class(DatasetRegistry.VIDEOLLAVA.dataset_id))

    # Pretraining Stage in < align | full-align | finetune | full-finetune | second_finetune >
    stage: str = "finetune"
    pretrained_checkpoint: Optional[Path] = None        # explicit checkpoint for `finetune` (else align-run discovery)
    resume_from_checkpoint: Optional[Path] = None       # intermediate checkpoint dir to resume from
    save_checkpoint_after: Optional[int] = 512

    # Run Arguments
    run_id: Optional[str] = None
    run_root_dir: Path = Path("runs")
    seed: int = 7

    # Sequence/context parallelism: ring size for the LLM sequence dim
    # (mesh 'sp' axis; 1 = off). Capability beyond the reference — lets
    # long-video configs (raised num_frames / projector_token_length) shard
    # attention over chips instead of hitting single-chip memory.
    mesh_seq: int = 1
    # Pipeline parallelism: stage count for LLM depth (mesh 'pp' axis; 1 =
    # off; mutually exclusive with mesh_seq > 1). Capability beyond the
    # reference — shards the decoder's layer stack over chips (GPipe
    # microbatch schedule) for 13B-class recipes where fsdp-only hits the
    # per-chip HBM wall. pp_microbatches = 0 picks min(2*pp, batch).
    mesh_pipe: int = 1
    pp_microbatches: int = 0

    # HF Hub Credentials (for any gated models)
    hf_token: Union[str, Path] = Path(".hf_token")

    # Tracking Parameters
    # parity with the reference default (scripts/pretrain_video.py:94); the
    # W&B tracker degrades to disabled-mode offline (tested air-gapped)
    trackers: Tuple[str, ...] = ("jsonl", "wandb")
    wandb_project: str = "merv"
    wandb_entity: Optional[str] = None
    slurm_id: Optional[int] = -1
    # fmt: on

    def __post_init__(self) -> None:
        if self.stage.endswith("align"):
            prefix = "align"
        elif self.stage.endswith("finetune"):
            prefix = "finetune"
        else:
            raise ValueError(f"Stage `{self.stage}` is not supported!")

        for name in (
            "epochs", "max_steps", "global_batch_size", "per_device_batch_size",
            "learning_rate", "weight_decay", "max_grad_norm", "lr_scheduler_type",
            "warmup_ratio", "train_strategy",
        ):
            setattr(self, name, getattr(self.model, f"{prefix}_{name}"))

        assert len(self.model.num_frames) == len(self.model.video_backbone_ids), (
            f"Number of num_frames ({len(self.model.num_frames)}) must match backbones"
        )
        assert all(nf % min(self.model.num_frames) == 0 for nf in self.model.num_frames), (
            f"Number of frames should be multiple of the smallest num_frame. {self.model.num_frames}"
        )
        self.slurm_id = os.getenv("SLURM_JOB_ID", self.slurm_id)


@draccus.wrap()
def pretrain(cfg: PretrainConfig) -> None:
    overwatch.info("MERV-TPU :: Pretraining")
    worker_init_fn = set_global_seed(cfg.seed, get_worker_init_fn=True)

    # hf token: env var name, or file path (reference pretrain_video.py:146-152)
    hf_token = None
    if isinstance(cfg.hf_token, str) and cfg.hf_token in os.environ:
        hf_token = os.environ[cfg.hf_token]
    elif Path(cfg.hf_token).exists():
        hf_token = Path(cfg.hf_token).read_text().strip()

    model_id = cfg.model.model_id
    if cfg.run_id is None:
        cfg.run_id = f"{model_id}+stage-{cfg.stage}+x{cfg.seed}"
    run_dir = Path(cfg.run_root_dir) / cfg.run_id
    run_dir.mkdir(parents=True, exist_ok=True)
    (run_dir / "checkpoints").mkdir(exist_ok=True)
    with open(run_dir / "config.json", "w") as f:
        json.dump({"model": draccus.encode(cfg.model), "dataset": draccus.encode(cfg.dataset)}, f, indent=2, default=str)

    overwatch.info(f"Loading Video Backbones {cfg.model.video_backbone_ids}")
    video_backbones, video_transforms = get_video_backbone_and_transform(
        cfg.model.video_backbone_ids, cfg.model.image_resize_strategy, cfg.model.num_frames,
        scan_unroll=train_tower_scan_unroll(cfg.stage),
    )
    overwatch.info(f"Loading LLM Backbone {cfg.model.llm_backbone_id}")
    if cfg.mesh_seq > 1 and cfg.mesh_pipe > 1:
        raise ValueError("--mesh_seq and --mesh_pipe are mutually exclusive (pick one per run)")
    llm_backbone, tokenizer = get_llm_backbone_and_tokenizer(
        cfg.model.llm_backbone_id, llm_max_length=cfg.model.llm_max_length, hf_token=hf_token,
        sequence_parallel=cfg.mesh_seq > 1,
        pipeline_parallel=cfg.mesh_pipe > 1, pp_microbatches=cfg.pp_microbatches,
    )

    vidlm = get_vidlm(
        model_id, cfg.model.arch_specifier, cfg.model.feature_fusion,
        video_backbones, llm_backbone,
        enable_mixed_precision_training=cfg.model.enable_mixed_precision_training,
        projector_token_length=cfg.model.projector_token_length,
        visual_feature_length=cfg.model.visual_feature_length,
    )
    vidlm.freeze_backbones(cfg.stage)

    overwatch.info("Initializing parameters (random init / checkpoint import)")
    import jax

    params = vidlm.init(jax.random.PRNGKey(cfg.seed))
    params = load_stage_weights(vidlm, params, cfg.stage, run_dir, cfg.pretrained_checkpoint)

    overwatch.info(f"Building `{cfg.dataset.dataset_id}` => stage {cfg.stage}")
    dataset, collator = get_dataset_and_collator(
        cfg.stage, cfg.dataset, video_transforms, tokenizer,
        prompt_builder_fn=llm_backbone.prompt_builder_fn, num_frames=cfg.model.num_frames,
    )

    mesh = None
    if cfg.mesh_seq > 1 or cfg.mesh_pipe > 1:
        from merv_tpu.parallel import MeshConfig, build_mesh

        mesh = build_mesh(
            MeshConfig(data=1, fsdp=-1, tensor=1, seq=cfg.mesh_seq, pipe=cfg.mesh_pipe)
        )

    strategy = get_train_strategy(
        cfg.train_strategy, vidlm,
        mesh=mesh,
        stage=cfg.stage, epochs=cfg.epochs, max_steps=cfg.max_steps,
        global_batch_size=cfg.global_batch_size, per_device_batch_size=cfg.per_device_batch_size,
        learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay, max_grad_norm=cfg.max_grad_norm,
        lr_scheduler_type=cfg.lr_scheduler_type, warmup_ratio=cfg.warmup_ratio,
        enable_gradient_checkpointing=cfg.model.enable_gradient_checkpointing,
        enable_mixed_precision_training=cfg.model.enable_mixed_precision_training,
        reduce_in_full_precision=cfg.model.reduce_in_full_precision,
        worker_init_fn=worker_init_fn,
        save_checkpoint_after=cfg.save_checkpoint_after or 512,
    )
    strategy.run_setup(
        run_dir, n_train_examples=len(dataset), params=params, video_transforms=video_transforms,
        resume_from_checkpoint=cfg.resume_from_checkpoint, seed=cfg.seed,
    )

    metrics = Metrics(
        cfg.trackers, cfg.run_id, run_dir, {"model": draccus.encode(cfg.model)}, cfg.stage,
        wandb_project=cfg.wandb_project, wandb_entity=cfg.wandb_entity,
        grad_accumulation_steps=strategy.grad_accumulation_steps, total_steps=strategy.total_steps,
    )

    overwatch.info("Starting Training Loop")
    strategy.run_training(dataset, collator, metrics, stage=cfg.stage, seed=cfg.seed, run_dir=run_dir)

    metrics.finalize()
    overwatch.info("Done with Training =>> Finalizing Metrics")


if __name__ == "__main__":
    pretrain()
