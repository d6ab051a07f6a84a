"""Deterministic samplers with aspect-ratio grouping and host sharding.

Parity with ``/root/reference/mmdet/datasets/samplers/group_sampler.py``:
images are grouped by aspect-ratio flag (w/h > 1) so every batch has a
consistent orientation (that plus canvas bucketing keeps XLA at exactly one
compiled shape). ``DistributedGroupSampler.set_epoch`` *returns* the epoch's
index iterator — the fork's look-ahead contract (``:147-149``) the
pseudo-label refresh relies on to know which image is about to be consumed.

Sharding is deterministic per (seed, epoch, rank): every rank shuffles with
the same key and takes a strided slice — no cross-host communication.
"""

from __future__ import annotations

import math

import numpy as np


class GroupSampler:
    """Single-process group sampler (``group_sampler.py:10-48``)."""

    def __init__(self, dataset, samples_per_gpu: int = 1, seed: int = 0):
        assert hasattr(dataset, "flag")
        self.dataset = dataset
        self.samples_per_gpu = samples_per_gpu
        self.seed = seed
        self.epoch = 0
        self.flag = np.asarray(dataset.flag, np.int64)
        self.group_sizes = np.bincount(self.flag)
        self.num_samples = 0
        for size in self.group_sizes:
            self.num_samples += int(
                np.ceil(size / samples_per_gpu)) * samples_per_gpu

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        return iter(self)

    def __iter__(self):
        rng = np.random.RandomState(self.seed + self.epoch)
        indices = []
        for i, size in enumerate(self.group_sizes):
            if size == 0:
                continue
            idx = np.where(self.flag == i)[0]
            rng.shuffle(idx)
            num_extra = int(np.ceil(size / self.samples_per_gpu)
                            ) * self.samples_per_gpu - len(idx)
            idx = np.concatenate([idx, idx[:num_extra]])
            indices.append(idx)
        indices = np.concatenate(indices)
        # shuffle batches
        batches = indices.reshape(-1, self.samples_per_gpu)
        perm = rng.permutation(len(batches))
        return iter(batches[perm].reshape(-1).tolist())

    def __len__(self):
        return self.num_samples


class DistributedGroupSampler:
    """Rank-sharded group sampler (``group_sampler.py:51-149``)."""

    def __init__(self, dataset, samples_per_gpu: int = 1, num_replicas: int = 1,
                 rank: int = 0, seed: int = 0):
        self.dataset = dataset
        self.samples_per_gpu = samples_per_gpu
        self.num_replicas = num_replicas
        self.rank = rank
        self.seed = seed
        self.epoch = 0
        self.flag = np.asarray(dataset.flag, np.int64)
        self.group_sizes = np.bincount(self.flag)
        self.num_samples = 0
        for size in self.group_sizes:
            self.num_samples += int(
                math.ceil(size / samples_per_gpu / num_replicas)
            ) * samples_per_gpu
        self.total_size = self.num_samples * num_replicas

    def set_epoch(self, epoch: int):
        """Returns this epoch's iterator (look-ahead contract)."""
        self.epoch = epoch
        return iter(self)

    def _epoch_indices(self) -> list[int]:
        rng = np.random.RandomState(self.seed + self.epoch)
        indices: list[int] = []
        for i, size in enumerate(self.group_sizes):
            if size == 0:
                continue
            idx = np.where(self.flag == i)[0]
            rng.shuffle(idx)
            target = int(math.ceil(
                size / self.samples_per_gpu / self.num_replicas)
            ) * self.samples_per_gpu * self.num_replicas
            reps = int(np.ceil(target / len(idx)))
            idx = np.tile(idx, reps)[:target]
            indices.extend(idx.tolist())
        # shuffle whole batches across groups
        arr = np.asarray(indices).reshape(-1, self.samples_per_gpu)
        perm = rng.permutation(len(arr))
        indices = arr[perm].reshape(-1).tolist()
        assert len(indices) == self.total_size
        return indices

    def __iter__(self):
        indices = self._epoch_indices()
        # strided per-rank batches: rank r takes batch r, r+R, r+2R, ...
        arr = np.asarray(indices).reshape(-1, self.samples_per_gpu)
        own = arr[self.rank::self.num_replicas].reshape(-1).tolist()
        assert len(own) == self.num_samples
        return iter(own)

    def __len__(self):
        return self.num_samples
