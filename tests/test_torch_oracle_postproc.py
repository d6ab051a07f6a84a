"""Torch oracles for detection post-processing: the reference's own
``mmdet/core/post_processing/bbox_nms.py`` (``multiclass_nms`` incl. the
threshold-before-score_factors rule and per-class boxes, ``fast_nms``)
executed on CPU with a faithful pure-torch mmcv ``nms``/``batched_nms``
stub (greedy, offset=0, suppress iou > thr — the mmcv kernel semantics),
against ``dsl_tpu/core/nms.py``'s static-shape implementations.

Also asserts our Jacobi-fixpoint NMS equals sequential greedy NMS on
random inputs (the correctness claim behind the TPU-native formulation).

Skipped automatically when /root/reference or torch is unavailable.
"""

import os.path as osp
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/mmdet"
REF_BN = osp.join(REF_ROOT, "core/post_processing/bbox_nms.py")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not osp.exists(REF_BN),
                                reason="reference tree not available")


def _pt_nms(boxes, scores, iou_threshold):
    """mmcv ``nms`` (offset=0): greedy by score, suppress IoU > thr."""
    n = boxes.shape[0]
    order = torch.argsort(scores, descending=True)
    supp = torch.zeros(n, dtype=torch.bool)
    keep = []
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order.tolist():
        if supp[i]:
            continue
        keep.append(i)
        xx1 = torch.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = torch.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = torch.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = torch.minimum(boxes[i, 3], boxes[:, 3])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas - inter)
        supp |= iou > iou_threshold
    keep = torch.tensor(keep, dtype=torch.long)
    dets = torch.cat([boxes[keep], scores[keep, None]], dim=1)
    return dets, keep


def _pt_batched_nms(boxes, scores, idxs, nms_cfg, class_agnostic=False):
    """mmcv ``batched_nms``: class-offset trick then plain nms."""
    nms_cfg_ = dict(nms_cfg)
    nms_cfg_.pop("type", "nms")
    if class_agnostic:
        boxes_for_nms = boxes
    else:
        max_coordinate = boxes.max()
        offsets = idxs.to(boxes) * (max_coordinate + 1)
        boxes_for_nms = boxes + offsets[:, None]
    dets, keep = _pt_nms(boxes_for_nms, scores,
                         nms_cfg_["iou_threshold"])
    return torch.cat([boxes[keep], dets[:, -1:]], dim=-1), keep


def _load_reference_postproc():
    import importlib.util

    new_mods = {}

    def _stub(name):
        mod = types.ModuleType(name)
        new_mods[name] = mod
        return mod

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = name.rsplit(".", 1)[0]
        new_mods[name] = mod
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    class _Reg:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    mmcv = _stub("mmcv")
    mmcv_ops = _stub("mmcv.ops")
    mmcv_ops_nms = _stub("mmcv.ops.nms")
    mmcv_ops_nms.batched_nms = _pt_batched_nms
    mmcv_ops_nms.nms = _pt_nms
    mmcv_ops.nms = mmcv_ops_nms
    mmcv.ops = mmcv_ops
    mmdet = _stub("mmdet")
    mmdet_core = _stub("mmdet.core")
    mmdet_bbox = _stub("mmdet.core.bbox")
    iou_pkg = _stub("mmdet.core.bbox.iou_calculators")
    iou_builder = _stub("mmdet.core.bbox.iou_calculators.builder")
    iou_builder.IOU_CALCULATORS = _Reg()

    saved = {k: sys.modules.get(k) for k in set(new_mods)}
    sys.modules.update(new_mods)
    try:
        iou2d = _load("mmdet.core.bbox.iou_calculators.iou2d_calculator",
                      osp.join(REF_ROOT,
                               "core/bbox/iou_calculators/"
                               "iou2d_calculator.py"))
        iou_pkg.bbox_overlaps = iou2d.bbox_overlaps
        bn = _load("ref_bbox_nms", REF_BN)
        return types.SimpleNamespace(multiclass_nms=bn.multiclass_nms,
                                     fast_nms=bn.fast_nms)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def ref_mod():
    return _load_reference_postproc()


def _rand_boxes(rng, n, spread=90.0):
    x1 = rng.uniform(0, spread, n)
    y1 = rng.uniform(0, spread, n)
    return np.stack([x1, y1, x1 + rng.uniform(5, 40, n),
                     y1 + rng.uniform(5, 40, n)], axis=1).astype(np.float32)


def _ours_valid(dets, labels, valid):
    dets, labels, valid = (np.asarray(dets), np.asarray(labels),
                           np.asarray(valid))
    return dets[valid], labels[valid]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("use_factors", [False, True])
def test_multiclass_nms_matches_reference(ref_mod, seed, use_factors):
    """Shared-box multiclass NMS incl. the mmdet rule: score_thr applies to
    RAW scores, score_factors multiply AFTER (``bbox_nms.py:52-62``)."""
    import jax.numpy as jnp
    from dsl_tpu.core.nms import multiclass_nms

    rng = np.random.RandomState(seed)
    p, c = 60, 4
    boxes = _rand_boxes(rng, p)
    scores_bg = rng.rand(p, c + 1).astype(np.float32)   # + background col
    factors = rng.rand(p).astype(np.float32) if use_factors else None

    ref_dets, ref_labels = ref_mod.multiclass_nms(
        torch.from_numpy(boxes), torch.from_numpy(scores_bg), 0.3,
        dict(type="nms", iou_threshold=0.5), max_num=20,
        score_factors=torch.from_numpy(factors)
        if factors is not None else None)

    dets, labels, valid = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores_bg[:, :-1]),
        score_thr=0.3, iou_threshold=0.5, max_per_img=20,
        score_factors=jnp.asarray(factors) if factors is not None else None)
    od, ol = _ours_valid(dets, labels, valid)

    assert len(od) == len(ref_dets), (len(od), len(ref_dets))
    np.testing.assert_allclose(od, ref_dets.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(ol, ref_labels.numpy())


def test_multiclass_nms_per_class_boxes_matches_reference(ref_mod):
    """(n, #class*4) per-class box regression variant (two-stage heads)."""
    import jax.numpy as jnp
    from dsl_tpu.core.nms import multiclass_nms

    rng = np.random.RandomState(5)
    p, c = 40, 3
    boxes = np.stack([_rand_boxes(rng, p) for _ in range(c)],
                     axis=1)                        # (P, C, 4)
    scores_bg = rng.rand(p, c + 1).astype(np.float32)

    ref_dets, ref_labels = ref_mod.multiclass_nms(
        torch.from_numpy(boxes.reshape(p, -1)),
        torch.from_numpy(scores_bg), 0.25,
        dict(type="nms", iou_threshold=0.6), max_num=15)
    dets, labels, valid = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores_bg[:, :-1]),
        score_thr=0.25, iou_threshold=0.6, max_per_img=15)
    od, ol = _ours_valid(dets, labels, valid)
    assert len(od) == len(ref_dets)
    np.testing.assert_allclose(od, ref_dets.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(ol, ref_labels.numpy())


@pytest.mark.parametrize("seed", [0, 3])
def test_fast_nms_matches_reference(ref_mod, seed):
    """YOLACT fast NMS: per-class triu-max suppression + global top-k."""
    import jax.numpy as jnp
    from dsl_tpu.core.nms import fast_nms

    rng = np.random.RandomState(seed)
    n, c, cd = 50, 4, 8
    boxes = _rand_boxes(rng, n)
    scores_bg = rng.rand(n, c + 1).astype(np.float32)
    coeffs = rng.randn(n, cd).astype(np.float32)

    ref_dets, ref_labels, ref_coeffs = ref_mod.fast_nms(
        torch.from_numpy(boxes), torch.from_numpy(scores_bg),
        torch.from_numpy(coeffs), score_thr=0.3, iou_thr=0.5,
        top_k=20, max_num=12)

    dets, labels, box_idx, valid = fast_nms(
        jnp.asarray(boxes), jnp.asarray(scores_bg[:, :-1]),
        score_thr=0.3, iou_threshold=0.5, top_k=20, max_num=12)
    od, ol = _ours_valid(dets, labels, valid)
    oc = coeffs[np.asarray(box_idx)[np.asarray(valid)]]
    assert len(od) == len(ref_dets)
    np.testing.assert_allclose(od, ref_dets.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(ol, ref_labels.numpy())
    np.testing.assert_allclose(oc, ref_coeffs.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_jacobi_nms_equals_sequential_greedy(ref_mod, seed):
    """Our Jacobi-fixpoint NMS == sequential greedy NMS (mmcv semantics:
    suppress iou > thr) — the TPU formulation's correctness claim."""
    import jax.numpy as jnp
    from dsl_tpu.core.nms import nms

    rng = np.random.RandomState(seed)
    n = 80
    boxes = _rand_boxes(rng, n, spread=60.0)   # dense -> many overlaps
    scores = rng.rand(n).astype(np.float32)
    _, keep = _pt_nms(torch.from_numpy(boxes), torch.from_numpy(scores),
                      0.5)
    dets, idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores),
                           iou_threshold=0.5, max_out=n)
    ours = np.sort(np.asarray(idx)[np.asarray(valid)])
    np.testing.assert_array_equal(ours, np.sort(keep.numpy()))
