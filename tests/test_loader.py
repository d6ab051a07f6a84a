import numpy as np
import pytest

from dsl_tpu.data.loader import DetDataLoader, MultiDataLoader
from dsl_tpu.data.samplers import DistributedGroupSampler, GroupSampler


class FakeDataset:
    """Tiny synthetic dataset skipping the pipeline (already 'processed')."""

    def __init__(self, n=10, wide_frac=0.5, h=64, w=64):
        self.n = n
        self.flag = np.asarray(
            [1 if i < n * wide_frac else 0 for i in range(n)], np.uint8)
        self.h, self.w = h, w
        self.data_infos = [dict(filename=f"img{i}.jpg", width=w, height=h)
                           for i in range(n)]

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        img = np.full((self.h, self.w, 3), idx, np.float32)
        return dict(
            img=img, img_shape=img.shape,
            gt_bboxes=np.asarray([[1.0, 1.0, 10.0, 10.0]], np.float32),
            gt_labels=np.asarray([idx % 3], np.int64),
            gt_bboxes_ignore=np.zeros((0, 4), np.float32),
            scale_factor=np.ones(4, np.float32))


def test_group_sampler_groups_batches():
    ds = FakeDataset(10)
    s = GroupSampler(ds, samples_per_gpu=2, seed=0)
    idx = list(iter(s))
    assert len(idx) >= 10
    # every batch comes from one aspect-ratio group
    for i in range(0, len(idx), 2):
        flags = {int(ds.flag[j]) for j in idx[i:i + 2]}
        assert len(flags) == 1


def test_distributed_sampler_partitions():
    ds = FakeDataset(16)
    parts = []
    for rank in range(4):
        s = DistributedGroupSampler(ds, samples_per_gpu=2, num_replicas=4,
                                    rank=rank, seed=0)
        it = s.set_epoch(3)
        parts.append(list(it))
    # equal length, deterministic, batches group-consistent
    assert len({len(p) for p in parts}) == 1
    total = sum(parts, [])
    assert len(total) == sum(len(p) for p in parts)
    s2 = DistributedGroupSampler(ds, samples_per_gpu=2, num_replicas=4,
                                 rank=0, seed=0)
    assert list(s2.set_epoch(3)) == parts[0]
    assert list(s2.set_epoch(4)) != parts[0]  # epoch reshuffles


def test_det_dataloader_batches():
    ds = FakeDataset(8)
    dl = DetDataLoader(ds, samples_per_gpu=2, num_workers=2,
                       canvas_hw=(64, 64), max_gt=4, max_ignore=2)
    batches = list(dl)
    assert len(batches) == len(dl)
    b = batches[0]
    assert b["images"].shape == (2, 64, 64, 3)
    assert b["gt_bboxes"].shape == (2, 4, 4)
    assert b["gt_valid"][:, 0].all()


def test_det_dataloader_worker_order_matches_sampler():
    ds = FakeDataset(8)
    dl = DetDataLoader(ds, samples_per_gpu=2, num_workers=3,
                       canvas_hw=(64, 64))
    order = dl.upcoming_indices()
    got = [int(s["img"][0, 0, 0]) for s in dl.sample_iter()]
    assert got == order


def test_multi_dataloader_merge():
    lab = DetDataLoader(FakeDataset(8), samples_per_gpu=2, num_workers=1,
                        canvas_hw=(64, 64))
    unl = DetDataLoader(FakeDataset(4), samples_per_gpu=2, num_workers=1,
                        canvas_hw=(64, 64))
    mdl = MultiDataLoader(lab, unl, ratio=(1, 1), unlabel_weight=3.0)
    assert len(mdl) == max(len(lab), len(unl))
    batches = list(mdl)
    assert len(batches) == len(mdl)
    b = batches[0]
    assert b["images"].shape == (4, 64, 64, 3)          # 2 labeled + 2 unlabeled
    assert b["source_weight"].tolist() == [1.0, 1.0, 3.0, 3.0]


def test_multi_dataloader_restarts_smaller_stream():
    lab = DetDataLoader(FakeDataset(12), samples_per_gpu=2, num_workers=1,
                        canvas_hw=(64, 64))
    unl = DetDataLoader(FakeDataset(4), samples_per_gpu=2, num_workers=1,
                        canvas_hw=(64, 64))
    mdl = MultiDataLoader(lab, unl, ratio=(1, 1))
    batches = list(mdl)
    # unlabeled stream restarted (12/2=6 merged batches need 12 unlabeled
    # samples from a 4-image set)
    assert len(batches) == 6


def test_multi_dataloader_scale_invariant():
    lab = DetDataLoader(FakeDataset(4), samples_per_gpu=2, num_workers=1,
                        canvas_hw=(64, 64))
    unl = DetDataLoader(FakeDataset(4), samples_per_gpu=2, num_workers=1,
                        canvas_hw=(64, 64))
    mdl = MultiDataLoader(lab, unl, ratio=(1, 1), unlabel_weight=3.0,
                          scale_invariant=True)
    b = next(iter(mdl))
    assert b["images"].shape[0] == 5                    # 2+2+1 half-res
    assert int(b["si_pair"]["full"]) == 3
    assert int(b["si_pair"]["half"]) == 4



def test_orientation_aware_canvas():
    from dsl_tpu.data.formatting import select_canvas

    assert select_canvas([(100, 200)], (800, 1344)) == (800, 1344)
    assert select_canvas([(200, 100)], (800, 1344)) == (1344, 800)
    assert select_canvas([(100, 200), (200, 100)], (800, 1344)) == \
        (1344, 1344)


def test_loader_portrait_batch_uses_portrait_canvas():
    class PortraitDs(FakeDataset):
        def __getitem__(self, idx):
            img = np.full((120, 64, 3), idx, np.float32)   # portrait
            return dict(
                img=img, img_shape=img.shape,
                gt_bboxes=np.asarray([[1.0, 1.0, 10.0, 10.0]], np.float32),
                gt_labels=np.asarray([0], np.int64),
                gt_bboxes_ignore=np.zeros((0, 4), np.float32),
                scale_factor=np.ones(4, np.float32))

    ds = PortraitDs(4)
    dl = DetDataLoader(ds, samples_per_gpu=2, num_workers=1,
                       canvas_hw=(64, 128))
    b = next(iter(dl))
    assert b["images"].shape == (2, 128, 64, 3)   # portrait canvas
