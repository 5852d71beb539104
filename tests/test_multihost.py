"""Multi-host data-path unit coverage (VERDICT round-1 weak #5).

Only one process exists in CI, so these tests pin the *math* of the
process-sharded path: sampler shards must be disjoint + covering with
per-batch modality purity, and ``_put_batch`` must take the
``make_array_from_process_local_data`` branch with the right reshape/spec
when ``jax.process_count() > 1``.
"""

from __future__ import annotations

import numpy as np
import pytest

import merv_tpu.training.strategies.base_strategy as bs
from merv_tpu.parallel import MeshConfig, build_mesh
from merv_tpu.util.batching_utils import EpochShardSampler, SplitModalitySampler


class _FakeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


def _modality_lengths(n, rng):
    # multimodal / unimodal mix with word-count lengths (reference
    # get_modality_lengths, datasets.py:237-244)
    return [(bool(rng.rand() < 0.7), int(rng.randint(3, 60))) for _ in range(n)]


@pytest.mark.parametrize("n_examples", [64, 100])
def test_split_modality_sampler_two_replica_sharding(n_examples):
    rng = np.random.RandomState(0)
    ml = _modality_lengths(n_examples, rng)
    ds = _FakeDataset(n_examples)
    gbs = 16
    samplers = [
        SplitModalitySampler(ds, ml, global_batch_size=gbs, num_replicas=2, rank=r, seed=3) for r in (0, 1)
    ]
    shards = [list(s) for s in samplers]
    # reference semantics: EACH modality pads to a multiple of global_batch_size
    # (batching_utils.py:100-107), so iteration length exceeds __len__'s
    # num_samples when both modalities have ragged tails — faithful quirk
    n_mm = sum(1 for is_mm, _ in ml if is_mm)
    n_uni = len(ml) - n_mm
    padded_total = -(-n_mm // gbs) * gbs + (-(-n_uni // gbs) * gbs if n_uni else 0)
    assert len(shards[0]) == len(shards[1]) == padded_total // 2

    # per-replica contiguous sub-batches must be single-modality AND the
    # replicas' same-position batches must share one modality (a global
    # batch is split across replicas, reference batching_utils.py:113-149)
    per_replica = gbs // 2
    for b in range(len(shards[0]) // per_replica):
        mods = set()
        for r in (0, 1):
            chunk = shards[r][b * per_replica : (b + 1) * per_replica]
            mods |= {ml[i][0] for i in chunk}
        assert len(mods) == 1, f"global batch {b} mixes modalities across replicas"

    # covering: every example appears on some replica (reference asserts
    # len(set(indices)) == len(dataset), batching_utils.py:191); duplicates
    # only from the per-modality end-padding
    union = set(shards[0]) | set(shards[1])
    assert union == set(range(n_examples))
    counts = np.bincount(shards[0] + shards[1], minlength=n_examples)
    assert counts.min() >= 1
    assert int(counts.sum()) == padded_total
    assert int((counts - 1).sum()) == padded_total - n_examples


@pytest.mark.parametrize("n", [10, 16])
def test_epoch_shard_sampler_disjoint_covering(n):
    ds = _FakeDataset(n)
    s0 = EpochShardSampler(ds, num_replicas=2, rank=0, seed=1)
    s1 = EpochShardSampler(ds, num_replicas=2, rank=1, seed=1)
    a, b = list(s0), list(s1)
    assert len(a) == len(b) == -(-n // 2)
    assert set(a) | set(b) == set(range(n))
    # strided split of one permutation: same epoch -> no index appears twice
    # unless it's the wrap-around pad
    dup = [i for i in a if i in b]
    assert len(dup) <= (2 * len(a)) - n
    # different epochs give different permutations
    s0.set_epoch(1)
    assert list(s0) != a


def test_put_batch_multihost_branch(monkeypatch, mesh8):
    """process_count=2: every array must route through
    make_array_from_process_local_data with the [accum, micro, ...] reshape
    and the batch axis sharded (base_strategy.py:186-213)."""
    mesh = build_mesh(MeshConfig(data=2, fsdp=4, tensor=1))
    strat = object.__new__(bs.TrainingStrategy)
    strat.mesh = mesh
    strat.grad_accumulation_steps = 2

    calls = []

    def fake_make(sharding, x):
        calls.append((sharding, np.asarray(x)))
        return np.asarray(x)

    monkeypatch.setattr(bs.jax, "process_count", lambda: 2)
    monkeypatch.setattr(bs.jax, "make_array_from_process_local_data", fake_make)

    B, T = 8, 6  # per-process slice
    batch = {
        "input_ids": np.ones((B, T), np.int32),
        "attention_mask": np.ones((B, T), np.int32),
        "labels": np.ones((B, T), np.int32),
        "video_values": [np.zeros((B, 3, 2, 8, 8), np.float32)],
        "is_multimodal": np.ones((B,), bool),
        "is_image": np.zeros((B,), bool),
    }
    out = bs.TrainingStrategy._put_batch(strat, batch)
    assert len(calls) == 6  # every tensor took the multihost branch
    for sharding, x in calls:
        assert x.shape[0] == 2 and x.shape[1] == B // 2  # [accum, micro, ...]
        spec = tuple(sharding.spec)
        assert spec[0] is None  # accum axis replicated
        assert spec[1] is not None  # micro-batch axis sharded over data/fsdp
    assert out["input_ids"].shape == (2, 4, T)


def test_put_batch_single_host_no_accum(mesh8):
    mesh = build_mesh(MeshConfig(data=2, fsdp=4, tensor=1))
    strat = object.__new__(bs.TrainingStrategy)
    strat.mesh = mesh
    strat.grad_accumulation_steps = 1
    batch = {
        "input_ids": np.ones((8, 4), np.int32),
        "attention_mask": np.ones((8, 4), np.int32),
        "labels": np.ones((8, 4), np.int32),
        "video_values": [np.zeros((8, 3, 2, 8, 8), np.float32)],
        "is_multimodal": np.ones((8,), bool),
        "is_image": np.zeros((8,), bool),
    }
    out = bs.TrainingStrategy._put_batch(strat, batch)
    assert out["input_ids"].shape == (8, 4)
    assert out["video_values"][0].shape == (8, 3, 2, 8, 8)


def test_prefetch_map_order_and_error_capture():
    """prefetch_map yields results in submission order, keeps the pipeline
    full, and RETURNS exceptions instead of raising (per-item fallback)."""
    import time as _time

    from merv_tpu.util.prefetch import prefetch_map

    def work(x):
        _time.sleep(0.01 * (5 - x % 5))  # out-of-order completion
        if x == 3:
            raise ValueError("bad item")
        return x * 10

    out = list(prefetch_map(range(8), work, lookahead=3, max_workers=4))
    assert [item for item, _ in out] == list(range(8))
    for item, res in out:
        if item == 3:
            assert isinstance(res, ValueError)
        else:
            assert res == item * 10
