import json
import os

import numpy as np
import cv2
import pytest

from dsl_tpu.core.eval.mean_ap import average_precision, eval_map, \
    eval_recalls
from dsl_tpu.data.datasets.voc import VOCDataset
from dsl_tpu.data.datasets.semivoc import SemiVOCDataset
from dsl_tpu.data.datasets.voc2coco import Voc2CocoDataset

PIPELINE = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(128, 96), keep_ratio=True),
    dict(type="Normalize", mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True),
]


def _xml(objects, w=120, h=100):
    objs = "".join(
        f"<object><name>{n}</name><difficult>{d}</difficult>"
        f"<bndbox><xmin>{b[0]}</xmin><ymin>{b[1]}</ymin>"
        f"<xmax>{b[2]}</xmax><ymax>{b[3]}</ymax></bndbox></object>"
        for n, d, b in objects)
    return (f"<annotation><size><width>{w}</width><height>{h}</height>"
            f"<depth>3</depth></size>{objs}</annotation>")


@pytest.fixture
def voc_dir(tmp_path):
    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "Annotations").mkdir()
    for i in range(2):
        cv2.imwrite(str(tmp_path / "JPEGImages" / f"00000{i}.jpg"),
                    np.random.randint(0, 255, (100, 120, 3), np.uint8))
    (tmp_path / "Annotations" / "000000.xml").write_text(_xml(
        [("dog", 0, (10, 10, 50, 50)), ("cat", 1, (60, 60, 90, 90))]))
    (tmp_path / "Annotations" / "000001.xml").write_text(_xml(
        [("person", 0, (5, 5, 40, 70))]))
    (tmp_path / "list.txt").write_text("000000\n000001\n")
    return tmp_path


def test_voc_dataset_parses_xml(voc_dir):
    ds = VOCDataset(ann_file=str(voc_dir / "list.txt"), pipeline=PIPELINE,
                    img_prefix=str(voc_dir))
    assert len(ds) == 2
    ann = ds.get_ann_info(0)
    assert ann["labels"].tolist() == [ds.cat2label["dog"]]
    assert len(ann["bboxes_ignore"]) == 1  # difficult cat
    sample = ds[0]
    assert sample["img"].shape[2] == 3


def test_voc_evaluate_perfect(voc_dir):
    ds = VOCDataset(ann_file=str(voc_dir / "list.txt"), pipeline=PIPELINE,
                    img_prefix=str(voc_dir))
    results = []
    for i in range(len(ds)):
        ann = ds.get_ann_info(i)
        dets = np.concatenate(
            [ann["bboxes"], np.full((len(ann["bboxes"]), 1), 0.9)], axis=1)
        results.append((dets.astype(np.float32), ann["labels"]))
    metrics = ds.evaluate(results)
    assert abs(metrics["mAP"] - 1.0) < 1e-6


def test_voc2coco_dataset(voc_dir):
    ds = Voc2CocoDataset(ann_file=str(voc_dir / "list.txt"),
                         pipeline=PIPELINE, img_prefix=str(voc_dir))
    assert len(ds) == 2
    ann = ds.get_ann_info(0)
    assert len(ann["bboxes"]) >= 1
    # evaluate with COCO protocol on perfect dets
    results = []
    for i in range(len(ds)):
        a = ds.get_ann_info(i)
        dets = np.concatenate(
            [a["bboxes"], np.full((len(a["bboxes"]), 1), 0.9)], axis=1)
        results.append((dets.astype(np.float32), a["labels"]))
    m = ds.evaluate(results, verbose=False)
    assert m["bbox_mAP"] > 0.99


def test_semivoc_dataset(tmp_path):
    (tmp_path / "images").mkdir()
    for n in ("a.jpg", "b.jpg"):
        cv2.imwrite(str(tmp_path / "images" / n),
                    np.random.randint(0, 255, (100, 120, 3), np.uint8))
    (tmp_path / "list.txt").write_text("a.jpg\nb.jpg\n")
    store = tmp_path / "annos"
    store.mkdir()
    for n in ("a.jpg", "b.jpg"):
        (store / f"{n}.json").write_text(json.dumps(dict(
            imageName="full/" + n, targetNum=2,
            rects=[[10, 10, 50, 50], [60, 60, 90, 90]],
            tags=["dog", "cat"], scores=[0.9, 0.2], masks=[])))
    mapper = tmp_path / "cat_info.json"
    import dsl_tpu.data.datasets.voc as vocmod

    cat2id = {c: i for i, c in enumerate(vocmod.VOC_CLASSES)}
    cat2id["bg"] = len(vocmod.VOC_CLASSES)
    id2cat = {str(i): c for c, i in cat2id.items()}
    mapper.write_text(json.dumps(dict(cat2id=cat2id, id2cat=id2cat)))
    ds = SemiVOCDataset(ann_file=str(tmp_path / "list.txt"),
                        pipeline=PIPELINE, ann_path=str(store),
                        labelmapper=str(mapper), thres=[0.1, 0.4],
                        img_prefix=str(tmp_path / "images"))
    assert len(ds) == 2
    ann = ds.get_ann_info(0)
    assert len(ann["bboxes"]) == 1        # dog 0.9 -> gt
    assert len(ann["bboxes_ignore"]) == 1  # cat 0.2 -> ignore


def test_average_precision_modes():
    rec = np.array([0.25, 0.5, 0.75, 1.0])
    prec = np.array([1.0, 1.0, 0.5, 0.5])
    ap_area = average_precision(rec, prec, "area")
    assert abs(ap_area - (0.5 * 1.0 + 0.5 * 0.5)) < 1e-6
    ap_11 = average_precision(rec, prec, "11points")
    assert 0 < ap_11 <= 1


def test_eval_map_second_det_on_same_gt_is_fp():
    ann = dict(bboxes=np.array([[0., 0., 10., 10.]]),
               labels=np.array([0]),
               bboxes_ignore=np.zeros((0, 4)))
    dets = [[np.array([[0, 0, 10, 10, 0.9], [0, 0, 10, 10, 0.8]],
                      np.float32)]]
    mean_ap, res = eval_map(dets, [ann])
    assert res[0]["num_gts"] == 1
    # the duplicate is a FP: final precision 1/2 (AP unaffected since the
    # FP ranks after full recall — VOC area-AP envelope semantics)
    assert abs(res[0]["precision"][-1] - 0.5) < 1e-6
    assert mean_ap == 1.0


def test_eval_recalls():
    gts = [np.array([[0., 0., 10., 10.]])]
    props = [np.array([[0, 0, 10, 10, 0.9], [50, 50, 60, 60, 0.8]])]
    r = eval_recalls(gts, props, proposal_nums=(1, 2), iou_thrs=(0.5,))
    assert r[0, 0] == 1.0 and r[1, 0] == 1.0
