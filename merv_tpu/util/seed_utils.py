"""Seeding + dataloader-worker RNG isolation.

Parity with reference ``merv/util/torch_utils.py:30-74``: a global seed for
python/numpy/torch plus a ``worker_init_fn`` that derives independent,
deterministic per-worker seeds (rank- and worker-aware), so augmentation RNG
never collides across workers/epochs. JAX adds explicit PRNG keys on top
(model init / sampling take keys, so no hidden global state there).
"""

from __future__ import annotations

import random
from typing import Callable, Optional

import numpy as np


def set_global_seed(seed: int, get_worker_init_fn: bool = False) -> Optional[Callable[[int], None]]:
    """Sets seed for all randomness libraries (python, numpy, torch)."""
    assert np.iinfo(np.uint32).min < seed < np.iinfo(np.uint32).max, "Seed outside the np.uint32 range!"
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except Exception:
        pass
    return worker_init_function if get_worker_init_fn else None


def worker_init_function(worker_id: int) -> None:
    """Borrowed host-RNG isolation recipe (reference torch_utils.py:43-74):
    splitmix-style seed sequence per (base_seed, worker_id)."""
    import torch

    process_seed = torch.initial_seed()
    base_seed = process_seed - worker_id
    seed_seq = np.random.SeedSequence([base_seed, worker_id])
    np.random.seed(seed_seq.generate_state(4))
    torch_seed_seq, random_seed_seq = seed_seq.spawn(2)
    torch.manual_seed(torch_seed_seq.generate_state(1, dtype=np.uint64)[0])
    random_seed = (random_seed_seq.generate_state(2, dtype=np.uint64).astype(object) * [1 << 64, 1]).sum()
    random.seed(random_seed)
