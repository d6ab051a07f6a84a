"""Dataset base class — map-style, pipeline-driven.

Parity with ``/root/reference/mmdet/datasets/custom.py:1-367``:
``load_annotations -> data_infos``, ``get_ann_info``, min-size/empty-GT
filtering, aspect-ratio group flags (w/h > 1), and
prepare_train_img/prepare_test_img running the transform pipeline.
"""

from __future__ import annotations

import os.path as osp

import numpy as np

from dsl_tpu.data.pipelines import Compose  # imports register all transforms
from dsl_tpu.registry import DATASETS


@DATASETS.register
class CustomDataset:
    CLASSES: tuple = ()

    def __init__(self, ann_file, pipeline, classes=None, data_root=None,
                 img_prefix="", test_mode=False, filter_empty_gt=True,
                 **kwargs):
        self.ann_file = ann_file
        self.data_root = data_root
        self.img_prefix = img_prefix
        self.test_mode = test_mode
        self.filter_empty_gt = filter_empty_gt
        if classes is not None:
            self.CLASSES = tuple(classes)
        if self.data_root is not None:
            if not osp.isabs(self.ann_file):
                self.ann_file = osp.join(self.data_root, self.ann_file)
            if self.img_prefix and not osp.isabs(self.img_prefix):
                self.img_prefix = osp.join(self.data_root, self.img_prefix)
        self.data_infos = self.load_annotations(self.ann_file)
        if not test_mode:
            valid_inds = self._filter_imgs()
            self.data_infos = [self.data_infos[i] for i in valid_inds]
            self._set_group_flag()
        self.pipeline = Compose(pipeline)

    # -- to be overridden --------------------------------------------------
    def load_annotations(self, ann_file):
        raise NotImplementedError

    def get_ann_info(self, idx):
        return self.data_infos[idx]["ann"]

    def _filter_imgs(self, min_size=32):
        valid = []
        for i, info in enumerate(self.data_infos):
            if min(info["width"], info["height"]) < min_size:
                continue
            if self.filter_empty_gt:
                ann = self.get_ann_info(i)
                if len(ann["bboxes"]) == 0:
                    continue
            valid.append(i)
        return valid

    # -- grouping (aspect-ratio buckets for the group sampler) -------------
    def _set_group_flag(self):
        self.flag = np.zeros(len(self), np.uint8)
        for i, info in enumerate(self.data_infos):
            if info["width"] / info["height"] > 1:
                self.flag[i] = 1

    # -- access ------------------------------------------------------------
    def __len__(self):
        return len(self.data_infos)

    def pre_pipeline(self, results):
        results["img_prefix"] = self.img_prefix
        results["bbox_fields"] = []
        return results

    def prepare_train_img(self, idx):
        img_info = self.data_infos[idx]
        ann_info = self.get_ann_info(idx)
        results = dict(img_info=img_info, ann_info=ann_info)
        return self.pipeline(self.pre_pipeline(results))

    def prepare_test_img(self, idx):
        img_info = self.data_infos[idx]
        results = dict(img_info=img_info)
        return self.pipeline(self.pre_pipeline(results))

    def __getitem__(self, idx):
        if self.test_mode:
            return self.prepare_test_img(idx)
        while True:
            data = self.prepare_train_img(idx)
            if data is not None:
                return data
            idx = np.random.randint(len(self))
