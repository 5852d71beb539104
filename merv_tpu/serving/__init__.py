"""TPU-native serving runtime.

The reference serves through HF ``GenerationMixin.generate`` one batch at a
time (reference ``merv/models/vidlms/merv.py:779-830``): a request group pads
to the longest member and every slot waits for the slowest sequence before
the next group starts. This package adds a continuous-batching engine with
per-slot KV-cache pointers so finished slots are refilled while the rest keep
decoding — the serving pattern large-scale deployments need and the
reference has no story for.
"""

from merv_tpu.serving.engine import (
    ContinuousBatchingEngine,
    EngineStats,
    Request,
    RequestResult,
)

__all__ = ["ContinuousBatchingEngine", "EngineStats", "Request", "RequestResult"]
