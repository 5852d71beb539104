"""Training strategy ABC + the training loop.

Behavior parity with reference ``merv/training/strategies/base_strategy.py:34-276``:
hyperparameter validation (batch divisibility ``:87-89``), sampler selection
(SplitModalitySampler for finetune vs shuffled epoch sampling, ``:129-151``),
epochs inflated to 100 under max_steps (``:163-167``), resume fast-forward by
skipping consumed batches (``:191-202``), periodic checkpoints every
``save_checkpoint_after`` optimizer steps + end-of-epoch save (``:260-276``).

TPU-native re-architecture: the per-batch autocast/backward/clip/step sequence
(``:208-271``) is ONE jitted XLA program (see merv_tpu/training/train_step.py)
consuming the full global batch with grad-accumulation folded into a
``lax.scan`` — the host loop only feeds data and logs.
"""

from __future__ import annotations

from abc import ABC
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from merv_tpu.models.vidlms import MERV
from merv_tpu.overwatch import initialize_overwatch
from merv_tpu.parallel import batch_spec, build_mesh
from merv_tpu.training.checkpointing import latest_checkpoint, load_checkpoint, parse_checkpoint_name, save_checkpoint
from merv_tpu.training.metrics import Metrics
from merv_tpu.training.optimizers import build_optimizer, build_schedule
from merv_tpu.training.train_step import (
    TrainState,
    jit_train_step,
    make_loss_fn,
    make_train_step,
    shard_train_state,
)
from merv_tpu.util.batching_utils import SplitModalitySampler

overwatch = initialize_overwatch(__name__)

PyTree = Any


class TrainingStrategy(ABC):
    sharding_strategy: str = "fsdp-full-shard"

    def __init__(
        self,
        vidlm: MERV,
        device_id: int = 0,
        stage: str = "finetune",
        epochs: int = 1,
        max_steps: Optional[int] = None,
        global_batch_size: int = 128,
        per_device_batch_size: int = 8,
        learning_rate: float = 2e-5,
        weight_decay: float = 0.1,
        max_grad_norm: float = 1.0,
        lr_scheduler_type: str = "linear-warmup+cosine-decay",
        warmup_ratio: float = 0.03,
        enable_gradient_checkpointing: bool = True,
        enable_mixed_precision_training: bool = True,
        reduce_in_full_precision: bool = False,
        mixed_precision_dtype: Any = jnp.bfloat16,
        worker_init_fn: Optional[Callable[[int], None]] = None,
        mesh: Optional[Mesh] = None,
        save_checkpoint_after: int = 512,
        loss_chunk_size: Optional[int] = None,
        **_: Any,
    ) -> None:
        self.vidlm, self.stage = vidlm, stage
        self.epochs, self.max_steps = epochs, max_steps
        self.global_batch_size, self.per_device_batch_size = global_batch_size, per_device_batch_size
        self.learning_rate, self.weight_decay, self.max_grad_norm = learning_rate, weight_decay, max_grad_norm
        self.lr_scheduler_type, self.warmup_ratio = lr_scheduler_type, warmup_ratio
        self.enable_gradient_checkpointing = enable_gradient_checkpointing
        self.enable_mixed_precision_training = enable_mixed_precision_training
        self.reduce_in_full_precision = reduce_in_full_precision
        self.mixed_precision_dtype = mixed_precision_dtype
        self.worker_init_fn = worker_init_fn
        self.save_checkpoint_after = save_checkpoint_after
        # stream the CE loss over token blocks (never materialize [B,T,vocab]
        # logits) — required at 7B full scale; None = direct loss
        self.loss_chunk_size = loss_chunk_size

        self.mesh = mesh if mesh is not None else build_mesh()
        # batch parallelism spans data x fsdp only: tensor/sp axes split the
        # per-example compute, not the batch (batch_spec pins activations to
        # data+fsdp), so the global-batch math must not count them
        self.world_size = int(self.mesh.shape["data"] * self.mesh.shape["fsdp"])
        # batch-sharded activation pinning at layer boundaries happens inside
        # jit_train_step's activation_mesh scope — never registered globally
        # (a leaked training mesh would infect later serving jits)

        assert self.global_batch_size % (self.per_device_batch_size * self.world_size) == 0, (
            f"global_bsz {global_batch_size} must be divisible by per_device_bsz {per_device_batch_size}"
            f" x world {self.world_size}"
        )
        self.grad_accumulation_steps = self.global_batch_size // self.per_device_batch_size // self.world_size
        assert self.grad_accumulation_steps >= 1, (
            f"global_bsz {global_batch_size} < per_device_bsz {per_device_batch_size} x world {self.world_size}"
        )
        if self.enable_mixed_precision_training:
            assert self.mixed_precision_dtype == jnp.bfloat16, "Only bf16 mixed precision is supported (native on TPU)!"

        # populated by run_setup
        self.state: Optional[TrainState] = None
        self.specs: Optional[TrainState] = None
        self.step_fn: Optional[Callable] = None
        self.schedule = None
        self.tx = None
        self.video_transforms = None
        self._resume_step = 0
        self._resume_epoch = 0

    # -- setup -------------------------------------------------------------------

    def run_setup(
        self,
        run_dir: Path,
        n_train_examples: int,
        params: Optional[PyTree] = None,
        video_transforms: Optional[List[Any]] = None,
        resume_from_checkpoint: Optional[Path] = None,
        seed: int = 7,
    ) -> None:
        steps_per_epoch = max(n_train_examples // self.global_batch_size, 1)
        total_steps = (
            self.max_steps if self.max_steps is not None else steps_per_epoch * self.epochs
        )
        self.total_steps = total_steps

        if params is None:
            params = self.vidlm.init(jax.random.PRNGKey(seed))
        # frozen towers hard-cast to their half-precision dtype (reference fsdp.py:212-230)
        params = dict(params)
        if "video_backbones" in params:
            params["video_backbones"] = {
                k: jax.tree_util.tree_map(lambda x: x.astype(vb.half_precision_dtype), sub)
                for (k, sub), vb in zip(params["video_backbones"].items(), self.vidlm.video_backbones)
            }

        self.schedule = build_schedule(self.lr_scheduler_type, self.learning_rate, total_steps, self.warmup_ratio)
        self.tx = build_optimizer(
            params, self.schedule, self.weight_decay, self.max_grad_norm,
            trainable_mask=self.vidlm.trainable_mask(params),
        )
        state = TrainState(params, self.tx.init(params), jnp.zeros((), jnp.int32))
        self.state, self.specs = shard_train_state(state, self.mesh, strategy=self.sharding_strategy)

        self.video_transforms = video_transforms
        loss_fn = make_loss_fn(
            self.vidlm, remat=self.enable_gradient_checkpointing,
            video_transforms=video_transforms, loss_chunk_size=self.loss_chunk_size,
        )
        step = make_train_step(
            loss_fn, self.tx, grad_accumulation_steps=self.grad_accumulation_steps,
            trainable_mask=self.vidlm.trainable_mask(params),
        )
        self.step_fn = jit_train_step(step, self.specs, self.mesh)

        if resume_from_checkpoint is not None:
            self.load_checkpoint(resume_from_checkpoint)

        overwatch.info(
            f"Strategy `{self.sharding_strategy}` ready: mesh={dict(self.mesh.shape)}, "
            f"accum={self.grad_accumulation_steps}, total_steps={total_steps}"
        )

    # -- checkpointing -----------------------------------------------------------

    def save_checkpoint(
        self, run_dir: Path, global_step: int, epoch: int, train_loss: Optional[float] = None,
        blocking: bool = True,
    ) -> None:
        save_checkpoint(
            run_dir, global_step, epoch, train_loss if train_loss is not None else 0.0,
            self.state.params, self.vidlm.trainable_module_keys or ["projectors", "feature_fusion"],
            opt_state=self.state.opt_state, blocking=blocking,
        )

    def load_checkpoint(self, checkpoint_path: Path) -> None:
        target = {
            "model": {k: jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), v)
                       for k, v in self.state.params.items()
                       if k in (self.vidlm.trainable_module_keys or ["projectors", "feature_fusion"])},
            "optimizer": jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype), self.state.opt_state),
        }
        restored = load_checkpoint(checkpoint_path, target=target)
        params = dict(self.state.params)
        params.update(restored["model"])
        self._resume_step, self._resume_epoch = restored["step"], restored["epoch"]
        self.state = TrainState(params, restored["optimizer"], jnp.asarray(restored["step"], jnp.int32))
        self.state, _ = shard_train_state(self.state, self.mesh, strategy=self.sharding_strategy)
        overwatch.info(f"Resumed from {checkpoint_path} at step {self._resume_step}")

    # -- the loop ------------------------------------------------------------------

    def _put_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Reshape to [accum, micro, ...] and shard the micro-batch axis.

        Multi-host: each process holds only its per-host slice (the sampler is
        process-sharded); ``make_array_from_process_local_data`` assembles the
        logical global batch without any cross-host copy.
        """
        accum = self.grad_accumulation_steps
        bspec = batch_spec(self.mesh)
        multihost = jax.process_count() > 1

        def place(x, spec):
            sharding = NamedSharding(self.mesh, spec)
            if multihost:
                return jax.make_array_from_process_local_data(sharding, x)
            return jax.device_put(x, sharding)

        def prep(x):
            x = np.asarray(x)
            if accum == 1:
                # no accumulation scan: the step consumes the batch directly
                return place(x, P(*bspec))
            micro = x.shape[0] // accum
            x = x.reshape(accum, micro, *x.shape[1:])
            return place(x, P(*((None,) + tuple(bspec))))

        out = {k: ([prep(v) for v in batch[k]] if isinstance(batch[k], list) else prep(batch[k]))
               for k in ("input_ids", "attention_mask", "labels", "video_values", "is_multimodal", "is_image")}
        return out

    def run_training(
        self,
        dataset,
        collator,
        metrics: Metrics,
        stage: str = "finetune",
        seed: int = 7,
        run_dir: Optional[Path] = None,
    ) -> None:
        import torch.utils.data as tud

        from merv_tpu.util.batching_utils import EpochShardSampler

        # multi-host: each process loads 1/world of every global batch
        n_proc, rank = jax.process_count(), jax.process_index()
        host_batch_size = self.global_batch_size // n_proc
        if "finetune" in stage:
            modality_lengths = dataset.get_modality_lengths()
            sampler = SplitModalitySampler(
                dataset, modality_lengths, global_batch_size=self.global_batch_size,
                num_replicas=n_proc, rank=rank, seed=seed,
            )
        else:
            sampler = EpochShardSampler(dataset, num_replicas=n_proc, rank=rank, seed=seed)

        dataloader = tud.DataLoader(
            dataset,
            batch_size=host_batch_size,
            sampler=sampler,
            collate_fn=collator,
            num_workers=2,
            drop_last=True,
            worker_init_fn=self.worker_init_fn,
        )

        steps_per_epoch = len(dataloader)
        epochs = self.epochs
        if self.max_steps is not None and steps_per_epoch < self.max_steps:
            epochs = 100  # reference base_strategy.py:163-167

        # profiling: MERV_TPU_PROFILE=<dir> captures an XLA trace of steps 3-8
        # (the TPU-native replacement for the reference's absent profiler, see
        # SURVEY §5.1; view with tensorboard or xprof)
        import os as _os

        profile_dir = _os.environ.get("MERV_TPU_PROFILE")
        profiling = False

        global_step = self._resume_step
        loss = 0.0
        done = False
        pending = None  # (global_step, device loss) — fetched one step late so
        # the host never blocks the step it just dispatched (async pipelining)

        def drain_pending() -> None:
            nonlocal loss, pending
            if pending is None:
                return
            p_step, p_loss = pending
            pending = None
            loss = float(p_loss)
            metrics.commit(
                global_step=p_step, lr=float(self.schedule(p_step)),
                update_step_time=True, loss=loss,
            )
            status = metrics.push()
            if overwatch.is_rank_zero() and p_step % 10 == 0:
                overwatch.info(status or metrics.get_status(loss))

        for epoch in range(self._resume_epoch, epochs):
            if sampler is not None:
                sampler.set_epoch(epoch)
            for batch_idx, batch in enumerate(dataloader):
                # resume fast-forward within the partially-consumed epoch
                # (reference :191-202)
                if epoch == self._resume_epoch and self._resume_step > 0:
                    if batch_idx < (self._resume_step % max(steps_per_epoch, 1)):
                        continue

                if profile_dir and global_step == self._resume_step + 3 and not profiling:
                    jax.profiler.start_trace(profile_dir)
                    profiling = True

                device_batch = self._put_batch(batch)
                self.state, step_metrics = self.step_fn(self.state, device_batch)
                global_step += 1

                if profiling and global_step >= self._resume_step + 8:
                    jax.tree_util.tree_map(lambda x: x.block_until_ready(), step_metrics)
                    jax.profiler.stop_trace()
                    profiling = False

                drain_pending()  # previous step has certainly finished by now
                pending = (global_step, step_metrics["loss"])

                if run_dir is not None and global_step % self.save_checkpoint_after == 0:
                    drain_pending()
                    # async: training resumes as soon as arrays are snapshotted
                    # to host; the write commits in a background thread
                    self.save_checkpoint(run_dir, global_step, epoch, loss, blocking=False)

                if self.max_steps is not None and global_step >= self.max_steps:
                    done = True
                    break
            drain_pending()
            if run_dir is not None:
                # end-of-epoch checkpoints record the NEXT epoch so resume
                # does not replay the epoch that just completed (blocking: the
                # run may end right after, and it also commits any in-flight
                # async periodic save first)
                from merv_tpu.training.checkpointing import wait_for_checkpoints

                wait_for_checkpoints()
                self.save_checkpoint(run_dir, global_step, epoch + 1, loss)
            if done:
                break
        drain_pending()
