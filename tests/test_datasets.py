import json
import os

import numpy as np
import cv2
import pytest

from dsl_tpu.data.datasets.coco import CocoDataset
from dsl_tpu.data.datasets.semicoco import SemiCOCODataset

PIPELINE = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(128, 96), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.0),
    dict(type="Normalize", mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True),
    dict(type="Pad", size_divisor=32),
]


@pytest.fixture
def coco_dir(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for name in ("a.jpg", "b.jpg", "tiny.jpg"):
        size = (16, 16) if name == "tiny.jpg" else (100, 120)
        cv2.imwrite(str(img_dir / name),
                    np.random.randint(0, 255, (*size, 3), np.uint8))
    ann = dict(
        images=[
            dict(id=1, file_name="a.jpg", width=120, height=100),
            dict(id=2, file_name="b.jpg", width=120, height=100),
            dict(id=3, file_name="tiny.jpg", width=16, height=16),
        ],
        categories=[dict(id=7, name="cat"), dict(id=9, name="dog")],
        annotations=[
            dict(id=1, image_id=1, category_id=7, bbox=[10, 10, 40, 40],
                 area=1600, iscrowd=0),
            dict(id=2, image_id=1, category_id=9, bbox=[5, 5, 20, 30],
                 area=600, iscrowd=1),
            dict(id=3, image_id=3, category_id=7, bbox=[1, 1, 5, 5],
                 area=25, iscrowd=0),
        ])
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return tmp_path


def test_coco_dataset_load_and_filter(coco_dir):
    ds = CocoDataset(ann_file=str(coco_dir / "ann.json"),
                     pipeline=PIPELINE, classes=("cat", "dog"),
                     img_prefix=str(coco_dir / "images"))
    # b.jpg has no anns (filtered), tiny.jpg < 32px (filtered)
    assert len(ds) == 1
    ann = ds.get_ann_info(0)
    np.testing.assert_allclose(ann["bboxes"], [[10, 10, 50, 50]])
    assert ann["labels"].tolist() == [0]
    np.testing.assert_allclose(ann["bboxes_ignore"], [[5, 5, 25, 35]])
    sample = ds[0]
    assert sample["img"].shape[2] == 3
    assert "gt_bboxes" in sample


def test_coco_dataset_evaluate_roundtrip(coco_dir):
    ds = CocoDataset(ann_file=str(coco_dir / "ann.json"),
                     pipeline=PIPELINE, classes=("cat", "dog"),
                     img_prefix=str(coco_dir / "images"))
    # feed back perfect GT as detections
    dets = np.asarray([[10, 10, 50, 50, 0.95]], np.float32)
    labels = np.asarray([0])
    metrics = ds.evaluate([(dets, labels)], verbose=False)
    assert abs(metrics["bbox_mAP"] - 1.0) < 1e-6


@pytest.fixture
def semicoco_dir(coco_dir):
    store = coco_dir / "annos"
    store.mkdir()
    (store / "a.jpg.json").write_text(json.dumps(dict(
        imageName="full/a.jpg", targetNum=3,
        rects=[[10, 10, 50, 50], [60, 10, 90, 40], [5, 60, 30, 90]],
        tags=["cat", "dog", "cat"],
        scores=[0.8, 0.2, 0.05],
        masks=[])))
    (store / "b.jpg.json").write_text(json.dumps(dict(
        imageName="full/b.jpg", targetNum=0, rects=[], tags=[], masks=[])))
    (store / "tiny.jpg.json").write_text(json.dumps(dict(
        imageName="full/tiny.jpg", targetNum=1, rects=[[1, 1, 6, 6]],
        tags=["cat"], masks=[])))
    mapper = coco_dir / "mmdet_category_info.json"
    mapper.write_text(json.dumps(dict(
        cat2id={"cat": 0, "dog": 1, "bg": 2},
        id2cat={"0": "cat", "1": "dog", "2": "bg"})))
    return coco_dir


def test_semicoco_triage_fixed_thres(semicoco_dir):
    ds = SemiCOCODataset(
        ann_file=str(semicoco_dir / "ann.json"), pipeline=PIPELINE,
        ann_path=str(semicoco_dir / "annos"),
        labelmapper=str(semicoco_dir / "mmdet_category_info.json"),
        thres=[0.1, 0.4], classes=("cat", "dog"),
        img_prefix=str(semicoco_dir / "images"))
    # only a.jpg survives (b: targetNum 0, tiny: <32px)
    assert len(ds) == 1
    ann = ds.get_ann_info(0)
    # score .8 >= .4 -> gt; .2 in [.1,.4) -> ignore; .05 < .1 -> dropped
    assert len(ann["bboxes"]) == 1
    assert ann["labels"].tolist() == [0]
    assert len(ann["bboxes_ignore"]) == 1


def test_semicoco_adathres_file(semicoco_dir, tmp_path):
    ada = tmp_path / "adathres.json"
    ada.write_text(json.dumps(dict(
        thres={"cat": 0.9, "dog": 0.15}, weights={"cat": 1.0, "dog": 1.0})))
    ds = SemiCOCODataset(
        ann_file=str(semicoco_dir / "ann.json"), pipeline=PIPELINE,
        ann_path=str(semicoco_dir / "annos"),
        labelmapper=str(semicoco_dir / "mmdet_category_info.json"),
        thres=str(ada), classes=("cat", "dog"),
        img_prefix=str(semicoco_dir / "images"))
    ann = ds.get_ann_info(0)
    # cat thres 0.9: score .8 -> ignore; dog thres .15: score .2 -> gt
    assert ann["labels"].tolist() == [1]
    assert len(ann["bboxes_ignore"]) == 1


def test_semicoco_missing_adathres_uses_default(semicoco_dir):
    ds = SemiCOCODataset(
        ann_file=str(semicoco_dir / "ann.json"), pipeline=PIPELINE,
        ann_path=str(semicoco_dir / "annos"),
        labelmapper=str(semicoco_dir / "mmdet_category_info.json"),
        thres=str(semicoco_dir / "nonexistent_adathres.json"),
        classes=("cat", "dog"),
        img_prefix=str(semicoco_dir / "images"))
    ann = ds.get_ann_info(0)
    # defaults [0.1, 0.3]: .8 -> gt, .2 -> ignore, .05 -> drop
    assert ann["labels"].tolist() == [0]
    assert len(ann["bboxes_ignore"]) == 1


def test_semicoco_dynamic_refresh_reread(semicoco_dir):
    """Rewriting the per-image JSON must be visible on next access — the
    label-store refresh contract (reference rewrites JSONs mid-training)."""
    ds = SemiCOCODataset(
        ann_file=str(semicoco_dir / "ann.json"), pipeline=PIPELINE,
        ann_path=str(semicoco_dir / "annos"),
        labelmapper=str(semicoco_dir / "mmdet_category_info.json"),
        thres=[0.1, 0.4], classes=("cat", "dog"),
        img_prefix=str(semicoco_dir / "images"))
    before = ds.get_ann_info(0)
    (semicoco_dir / "annos" / "a.jpg.json").write_text(json.dumps(dict(
        imageName="full/a.jpg", targetNum=1, rects=[[0, 0, 99, 99]],
        tags=["dog"], scores=[0.99], masks=[])))
    after = ds.get_ann_info(0)
    assert len(before["bboxes"]) == 1
    np.testing.assert_allclose(after["bboxes"], [[0, 0, 99, 99]])
    assert after["labels"].tolist() == [1]
