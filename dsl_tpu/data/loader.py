"""Data loaders: threaded-prefetch single-stream loader + the two-stream
labeled/unlabeled MultiDataLoader.

Parity with ``/root/reference/mmdet/datasets/builder.py``:
``build_dataloader`` (:56) → ``DetDataLoader`` (thread-pool prefetch instead
of torch worker processes); ``build_multi_dataloader``/``MultiDataLoader``
(:148-352) → :class:`MultiDataLoader` with the same semantics: a
``batch_config.ratio`` of labeled:unlabeled per merged batch, sub-loaders
auto-restart on exhaustion, length = max over sub-loaders. Instead of
DataContainer padding-to-batch-max (``_merge_data2one_batch`` :236-267),
samples land in a fixed canvas (TPU static shapes) and the merged batch
carries per-image ``source_weight``.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

from dsl_tpu.data.formatting import (
    DEFAULT_CANVAS, DEFAULT_MAX_GT, DEFAULT_MAX_IGNORE, build_batch,
    format_sample, select_canvas)
from dsl_tpu.data.samplers import DistributedGroupSampler, GroupSampler


class DetDataLoader:
    """Map-style loader: sampler -> pipeline -> fixed-shape samples.

    ``num_workers`` threads run the (cv2/PIL, GIL-releasing) pipeline;
    order is preserved. One epoch per ``__iter__``.
    """

    def __init__(self, dataset, samples_per_gpu: int = 2, num_workers: int = 2,
                 sampler=None, canvas_hw=DEFAULT_CANVAS,
                 max_gt: int = DEFAULT_MAX_GT,
                 max_ignore: int = DEFAULT_MAX_IGNORE, seed: int = 0,
                 source_weight: float = 1.0):
        self.dataset = dataset
        self.samples_per_gpu = samples_per_gpu
        self.num_workers = max(1, num_workers)
        self.sampler = sampler or GroupSampler(dataset, samples_per_gpu,
                                               seed=seed)
        self.canvas_hw = tuple(canvas_hw)
        self.max_gt = max_gt
        self.max_ignore = max_ignore
        self.source_weight = source_weight
        self.epoch = 0
        self._upcoming: list[int] = []

    def __len__(self):
        return len(self.sampler) // self.samples_per_gpu

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        return self.sampler.set_epoch(epoch)

    def upcoming_indices(self) -> list[int]:
        """Dataset indices of this epoch in consumption order (the clean
        replacement for the reference's ``runner.ITER`` look-ahead)."""
        return list(self.sampler.set_epoch(self.epoch))

    def _load_one(self, idx: int) -> dict:
        """Raw pipeline output; canvas formatting happens per batch (the
        canvas depends on the batch's orientations — see select_canvas)."""
        return self.dataset[idx]

    def _format(self, results: dict, canvas_hw) -> dict:
        return format_sample(results, canvas_hw, self.max_gt,
                             self.max_ignore)

    def sample_iter(self) -> Iterator[dict]:
        indices = self.upcoming_indices()
        if self.num_workers <= 1:
            for i in indices:
                yield self._load_one(i)
            return
        out_q: "queue.Queue[tuple[int, dict]]" = queue.Queue(
            maxsize=self.num_workers * 4)
        stop = threading.Event()

        def worker(worker_id: int):
            for pos in range(worker_id, len(indices), self.num_workers):
                if stop.is_set():
                    return
                out_q.put((pos, self._load_one(indices[pos])))

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            buffered: dict[int, dict] = {}
            next_pos = 0
            while next_pos < len(indices):
                while next_pos not in buffered:
                    pos, sample = out_q.get()
                    buffered[pos] = sample
                yield buffered.pop(next_pos)
                next_pos += 1
        finally:
            stop.set()

    def __iter__(self):
        it = self.sample_iter()
        batch = []
        for sample in it:
            batch.append(sample)
            if len(batch) == self.samples_per_gpu:
                canvas = select_canvas(
                    [r["img"].shape[:2] for r in batch], self.canvas_hw)
                yield build_batch(
                    [self._format(r, canvas) for r in batch],
                    source_weights=[self.source_weight] * len(batch))
                batch = []


class _Endless:
    """Restart a DetDataLoader's sample stream forever, bumping epoch
    (reference ``get_batch`` auto-restart, ``builder.py:336-345``)."""

    def __init__(self, loader: DetDataLoader):
        self.loader = loader
        self._it = iter(loader.sample_iter())

    def take(self, n: int) -> list[dict]:
        out = []
        while len(out) < n:
            try:
                out.append(next(self._it))
            except StopIteration:
                self.loader.epoch += 1
                self._it = iter(self.loader.sample_iter())
        return out


class MultiDataLoader:
    """Zip a labeled and an unlabeled loader into merged fixed-shape batches.

    Each merged batch = ``ratio[0]`` labeled + ``ratio[1]`` unlabeled samples
    (scaled so the total matches ``samples_per_gpu`` slots of each kind, as
    the reference's ``batch_config=dict(ratio=[[1, 1]])`` does), with
    ``source_weight`` 1.0 / ``unlabel_weight``. Optionally appends the
    scale-invariant half-res copy of the last (unlabeled) image.
    """

    def __init__(self, label_loader: DetDataLoader,
                 unlabel_loader: DetDataLoader, ratio=(1, 1),
                 unlabel_weight: float = 1.0, scale_invariant: bool = False,
                 n_shards: int = 1):
        self.label_loader = label_loader
        self.unlabel_loader = unlabel_loader
        self.ratio = tuple(ratio)
        self.unlabel_weight = unlabel_weight
        self.scale_invariant = scale_invariant
        self.n_shards = n_shards

    def __len__(self):
        # epoch length: each merged batch consumes n_shards sub-batches
        return max(1, max(len(self.label_loader), len(self.unlabel_loader))
                   // self.n_shards)

    def set_epoch(self, epoch: int):
        iters = [self.label_loader.set_epoch(epoch),
                 self.unlabel_loader.set_epoch(epoch)]
        return iters

    @property
    def batch_size(self) -> int:
        n_lab = self.label_loader.samples_per_gpu
        per = max(1, sum(self.ratio))
        return n_lab  # labeled slots per merged batch

    def __iter__(self):
        # per *device shard* counts; the global batch is n_shards groups of
        # [labeled..., unlabeled...] so a leading-axis 'data' sharding gives
        # every device the configured mix
        n_lab = self.label_loader.samples_per_gpu
        n_unl = max(1, int(round(n_lab * self.ratio[1] / self.ratio[0])))
        lab = _Endless(self.label_loader)
        unl = _Endless(self.unlabel_loader)
        for _ in range(len(self)):
            raw, weights = [], []
            for _s in range(self.n_shards):
                raw += lab.take(n_lab) + unl.take(n_unl)
                weights += [1.0] * n_lab + [self.unlabel_weight] * n_unl
            canvas = select_canvas([r["img"].shape[:2] for r in raw],
                                   self.label_loader.canvas_hw)
            samples = [self.label_loader._format(r, canvas) for r in raw]
            yield build_batch(samples, source_weights=weights,
                              scale_invariant=self.scale_invariant,
                              n_shards=self.n_shards)


def build_dataloader(dataset, samples_per_gpu=2, workers_per_gpu=2,
                     num_replicas=1, rank=0, seed=0, dist=False,
                     canvas_hw=DEFAULT_CANVAS, **kwargs):
    """Config-level builder (reference ``builder.py:56``)."""
    if dist and num_replicas > 1:
        sampler = DistributedGroupSampler(dataset, samples_per_gpu,
                                          num_replicas, rank, seed)
    else:
        sampler = GroupSampler(dataset, samples_per_gpu, seed)
    return DetDataLoader(dataset, samples_per_gpu, workers_per_gpu,
                         sampler=sampler, canvas_hw=canvas_hw, seed=seed,
                         **kwargs)
