"""Balanced samplers (instance-balanced pos / IoU-balanced neg) +
CocoPanoptic dataset with PQ evaluation."""

import json
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.models.roi_heads.standard_roi_head import sample_rois


def _setup_candidates():
    # 2 gts; 6 positives (4 on gt0, 2 on gt1); negatives across iou bins
    gt = jnp.asarray([[0.0, 0.0, 20.0, 20.0], [40.0, 40.0, 60.0, 60.0]])
    gt_labels = jnp.asarray([0, 1], jnp.int32)
    gt_valid = jnp.asarray([True, True])
    props = []
    for d in (0, 1, 2, 3):          # 4 near-gt0 positives
        props.append([0 + d, 0, 20 + d, 20])
    for d in (0, 1):                # 2 near-gt1 positives
        props.append([40 + d, 40, 60 + d, 60])
    # negatives with varying IoU vs gt0
    props += [[100, 100, 120, 120], [200, 200, 220, 220],
              [8, 8, 36, 36], [12, 12, 44, 44]]
    props = jnp.asarray(props, jnp.float32)
    valid = jnp.ones((props.shape[0],), bool)
    return props, valid, gt, gt_labels, gt_valid


def test_instance_balanced_pos_round_robin():
    props, valid, gt, gtl, gtv = _setup_candidates()
    rois, labels, assigned, v, is_pos = sample_rois(
        jax.random.PRNGKey(0), props, valid, gt, gtl, gtv, num_classes=4,
        num_samples=8, pos_fraction=0.5, pos_strategy="instance_balanced")
    # cap = 4 positives; round-robin guarantees both instances represented
    pos_assigned = np.asarray(assigned)[np.asarray(is_pos)]
    assert set(pos_assigned.tolist()) == {0, 1}


def test_iou_balanced_negatives_cover_bins():
    props, valid, gt, gtl, gtv = _setup_candidates()
    rois, labels, assigned, v, is_pos = sample_rois(
        jax.random.PRNGKey(1), props, valid, gt, gtl, gtv, num_classes=4,
        num_samples=10, pos_fraction=0.25, neg_strategy="iou_balanced")
    # all candidates fit: sanity — sampling stays valid and fixed-shape
    assert rois.shape == (10, 4)
    assert bool(np.asarray(v).any())


def test_coco_panoptic_dataset(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from dsl_tpu.data.datasets.coco_panoptic import CocoPanopticDataset

    h = w = 32
    # gt id map: segment 1 (thing cat 1) left half, segment 2 (stuff cat 2)
    # right half
    idmap = np.zeros((h, w), np.uint32)
    idmap[:, :16] = 1
    idmap[:, 16:] = 2
    png = np.stack([idmap % 256, idmap // 256, idmap // 65536],
                   axis=-1).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "img1.png"), png[:, :, ::-1])
    ann = dict(
        images=[dict(id=1, width=w, height=h, file_name="img1.jpg")],
        annotations=[dict(image_id=1, file_name="img1.png",
                          segments_info=[
                              dict(id=1, category_id=1, iscrowd=0, area=512),
                              dict(id=2, category_id=2, iscrowd=0, area=512),
                          ])],
        categories=[dict(id=1, name="thing", isthing=1),
                    dict(id=2, name="stuff", isthing=0)])
    ann_path = tmp_path / "pan.json"
    ann_path.write_text(json.dumps(ann))
    ds = CocoPanopticDataset(str(ann_path), pipeline=[],
                             seg_prefix=str(tmp_path), test_mode=True)
    info = ds.get_ann_info(0)
    assert info["bboxes"].shape == (1, 4)        # only the thing segment
    np.testing.assert_allclose(info["bboxes"][0], [0, 0, 16, 32])
    assert len(info["masks"]) == 1

    # perfect prediction -> PQ 1.0
    res = [(idmap.astype(np.int64),
            [dict(id=1, category_id=1), dict(id=2, category_id=2)])]
    m = ds.evaluate(res)
    np.testing.assert_allclose(m["PQ"], 1.0, atol=1e-6)
    # half-shifted thing prediction -> lower PQ
    bad = idmap.copy()
    bad[:, :8] = 99
    res2 = [(bad.astype(np.int64),
             [dict(id=1, category_id=1), dict(id=2, category_id=2),
              dict(id=99, category_id=1)])]
    m2 = ds.evaluate(res2)
    assert m2["PQ"] < 1.0


def test_load_panoptic_annotations_transform(tmp_path):
    """LoadPanopticAnnotations: thing masks as BitmapMasks + the
    things-first/stuff-after contiguous semantic map (255 void)."""
    cv2 = pytest.importorskip("cv2")
    from dsl_tpu.data.datasets.coco_panoptic import CocoPanopticDataset
    from dsl_tpu.data.pipelines.compose import Compose

    h = w = 32
    idmap = np.zeros((h, w), np.uint32)
    idmap[:, :16] = 1
    idmap[:, 16:] = 2
    png = np.stack([idmap % 256, idmap // 256, idmap // 65536],
                   axis=-1).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "img1.png"), png[:, :, ::-1])
    cv2.imwrite(str(tmp_path / "img1.jpg"),
                np.zeros((h, w, 3), np.uint8))
    ann = dict(
        images=[dict(id=1, width=w, height=h, file_name="img1.jpg")],
        annotations=[dict(image_id=1, file_name="img1.png",
                          segments_info=[
                              dict(id=1, category_id=1, iscrowd=0, area=512),
                              dict(id=2, category_id=2, iscrowd=0, area=512),
                          ])],
        categories=[dict(id=1, name="thing", isthing=1),
                    dict(id=2, name="stuff", isthing=0)])
    ann_path = tmp_path / "pan.json"
    ann_path.write_text(json.dumps(ann))
    ds = CocoPanopticDataset(str(ann_path), pipeline=[],
                             seg_prefix=str(tmp_path),
                             img_prefix=str(tmp_path), test_mode=True)
    pipe = Compose([dict(type="LoadImageFromFile"),
                    dict(type="LoadPanopticAnnotations")])
    results = pipe(dict(img_info=ds.data_infos[0],
                        ann_info=ds.get_ann_info(0),
                        img_prefix=str(tmp_path), seg_prefix=None))
    assert len(results["gt_masks"]) == 1
    sem = results["gt_semantic_seg"]
    assert (sem[:, :16] == 0).all()      # thing -> label 0
    assert (sem[:, 16:] == 1).all()      # stuff -> after things
