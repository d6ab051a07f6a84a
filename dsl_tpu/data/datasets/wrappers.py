"""Dataset wrappers: Concat / Repeat / ClassBalanced.

Parity with ``/root/reference/mmdet/datasets/dataset_wrappers.py:1-282``.
"""

from __future__ import annotations

import bisect
import math
from collections import defaultdict

import numpy as np

from dsl_tpu.registry import DATASETS


@DATASETS.register(name="ConcatDataset")
class ConcatDataset:
    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.cumulative_sizes = np.cumsum(
            [len(d) for d in self.datasets]).tolist()
        self.CLASSES = getattr(self.datasets[0], "CLASSES", ())
        if all(hasattr(d, "flag") for d in self.datasets):
            self.flag = np.concatenate([d.flag for d in self.datasets])

    def __len__(self):
        return self.cumulative_sizes[-1]

    def _locate(self, idx):
        ds_idx = bisect.bisect_right(self.cumulative_sizes, idx)
        base = 0 if ds_idx == 0 else self.cumulative_sizes[ds_idx - 1]
        return ds_idx, idx - base

    def __getitem__(self, idx):
        ds_idx, sample_idx = self._locate(idx)
        return self.datasets[ds_idx][sample_idx]

    def get_ann_info(self, idx):
        ds_idx, sample_idx = self._locate(idx)
        return self.datasets[ds_idx].get_ann_info(sample_idx)


@DATASETS.register(name="RepeatDataset")
class RepeatDataset:
    def __init__(self, dataset, times):
        self.dataset = dataset
        self.times = times
        self.CLASSES = getattr(dataset, "CLASSES", ())
        if hasattr(dataset, "flag"):
            self.flag = np.tile(dataset.flag, times)
        self._len = times * len(dataset)

    def __len__(self):
        return self._len

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]

    def get_ann_info(self, idx):
        return self.dataset.get_ann_info(idx % len(self.dataset))


@DATASETS.register(name="ClassBalancedDataset")
class ClassBalancedDataset:
    """Oversample images containing rare classes (LVIS repeat-factor
    sampling, reference semantics: repeat factor = max over categories in
    the image of sqrt(oversample_thr / category frequency))."""

    def __init__(self, dataset, oversample_thr: float):
        self.dataset = dataset
        self.oversample_thr = oversample_thr
        self.CLASSES = getattr(dataset, "CLASSES", ())
        repeat_factors = self._repeat_factors(dataset, oversample_thr)
        indices = []
        flags = []
        has_flag = hasattr(dataset, "flag")
        for i, rf in enumerate(repeat_factors):
            n = int(math.ceil(rf))
            indices.extend([i] * n)
            if has_flag:
                flags.extend([dataset.flag[i]] * n)
        self.indices = indices
        if has_flag:
            self.flag = np.asarray(flags, np.uint8)

    @staticmethod
    def _repeat_factors(dataset, thr):
        cat_freq = defaultdict(float)
        n = len(dataset)
        img_cats = []
        for i in range(n):
            ann = dataset.get_ann_info(i)
            cats = set(int(c) for c in ann["labels"])
            img_cats.append(cats)
            for c in cats:
                cat_freq[c] += 1.0 / n
        cat_repeat = {c: max(1.0, math.sqrt(thr / f))
                      for c, f in cat_freq.items()}
        return [max([cat_repeat[c] for c in cats], default=1.0)
                for cats in img_cats]

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[self.indices[idx]]

    def get_ann_info(self, idx):
        return self.dataset.get_ann_info(self.indices[idx])
