"""FSDP-equivalent strategies: parameter/optimizer sharding over the `fsdp` axis.

Name parity with the reference (reference ``merv/training/strategies/fsdp.py:42-91``):
- ``fsdp-full-shard``    (ZeRO-3): parameters AND optimizer state sharded;
  XLA SPMD inserts the all-gathers/reduce-scatters FSDP would issue, fused
  into the compiled step.
- ``fsdp-shard-grad-op`` (ZeRO-2): parameters replicated, optimizer state
  sharded; gradients reduce-scattered into the sharded update.

Wrap policies are unnecessary: sharding rules are per-parameter
(merv_tpu/parallel/sharding.py), subsuming the reference's per-backbone
auto-wrap composition (``merv.py:465-497``).
"""

from __future__ import annotations

from merv_tpu.training.strategies.base_strategy import TrainingStrategy


class FSDPStrategy(TrainingStrategy):
    def __init__(self, *args, sharding_strategy: str = "full-shard", **kwargs) -> None:
        self.sharding_strategy = (
            "fsdp-full-shard" if sharding_strategy in ("full-shard", "fsdp-full-shard") else "fsdp-shard-grad-op"
        )
        super().__init__(*args, **kwargs)
