"""DDP-equivalent strategy: full replication, gradients all-reduced.

Parity with reference ``merv/training/strategies/ddp.py:24-121`` (registered
but unused in the shipped configs — FSDP-only in practice). Keeps the
reference's weight-decay restriction.
"""

from __future__ import annotations

from merv_tpu.training.strategies.base_strategy import TrainingStrategy


class DDPStrategy(TrainingStrategy):
    sharding_strategy = "ddp"

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        assert self.weight_decay == 0, "DDP training does not currently support `weight_decay` > 0!"
