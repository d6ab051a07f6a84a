"""Torch oracle for the anchor generators against the reference's OWN code.

Loads ``/root/reference/mmdet/core/anchor/anchor_generator.py`` on CPU
(mmcv + registry stubbed) and pins our ``core/anchors.py`` generators to it:

- ``LegacyAnchorGenerator`` (V1.x retina: center_offset=0.5, (w-1) corner
  convention, rounding) — base anchors and full grids per level.
- ``SSDAnchorGenerator`` (SSD300 COCO ladder: basesize_ratio_range percent
  ladder, two squares + aspect anchors, scale_major=False reindexing).
- ``LegacySSDAnchorGenerator`` (centers at (stride-1)/2 + legacy corners).
- SSD512 COCO ladder (first-level 4/10 special case).

Skipped automatically when /root/reference or torch is unavailable.
"""

import os.path as osp
import sys
import types

import numpy as np
import pytest

REF_PATH = "/root/reference/mmdet/core/anchor/anchor_generator.py"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not osp.exists(REF_PATH),
                                reason="reference tree not available")


def _load_reference_anchor_generator():
    import importlib.util

    saved = {k: sys.modules.get(k) for k in
             ("mmcv", "refanch", "refanch.core", "refanch.core.anchor",
              "refanch.core.anchor.builder",
              "refanch.core.anchor.anchor_generator")}
    try:
        mmcv = types.ModuleType("mmcv")
        mmcv.is_tuple_of = lambda seq, t: isinstance(seq, tuple) and all(
            isinstance(x, t) for x in seq)
        sys.modules["mmcv"] = mmcv

        for pkg in ("refanch", "refanch.core", "refanch.core.anchor"):
            mod = types.ModuleType(pkg)
            mod.__path__ = []
            sys.modules[pkg] = mod
        builder = types.ModuleType("refanch.core.anchor.builder")

        class _Reg:
            def register_module(self, *a, **k):
                return lambda cls: cls

        builder.PRIOR_GENERATORS = _Reg()
        sys.modules["refanch.core.anchor.builder"] = builder

        spec = importlib.util.spec_from_file_location(
            "refanch.core.anchor.anchor_generator", REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["refanch.core.anchor.anchor_generator"] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def ref(request):
    return _load_reference_anchor_generator()


SIZES = [(10, 13), (5, 7), (3, 4), (2, 2), (1, 1)]


def _ref_grids(gen, sizes):
    return [g.numpy() for g in gen.grid_anchors(
        [tuple(s) for s in sizes], device="cpu")]


def test_legacy_anchor_generator_matches_reference(ref):
    from dsl_tpu.core.anchors import anchor_generator_from_cfg

    cfg = dict(type="LegacyAnchorGenerator", center_offset=0.5,
               octave_base_scale=4, scales_per_octave=3,
               ratios=[0.5, 1.0, 2.0], strides=[8, 16, 32, 64, 128])
    theirs = ref.LegacyAnchorGenerator(
        strides=cfg["strides"], ratios=cfg["ratios"],
        octave_base_scale=4, scales_per_octave=3, center_offset=0.5)
    ours = anchor_generator_from_cfg(cfg)
    for lvl in range(5):
        np.testing.assert_allclose(
            ours.base_anchors(lvl),
            theirs.base_anchors[lvl].numpy(), atol=1e-4,
            err_msg=f"legacy retina base anchors level {lvl}")
    ref_grids = _ref_grids(theirs, SIZES)
    for lvl, g in enumerate(ours.grid_anchors(SIZES)):
        np.testing.assert_allclose(np.asarray(g), ref_grids[lvl], atol=1e-3,
                                   err_msg=f"legacy grid level {lvl}")


def test_legacy_rpn_scales_matches_reference(ref):
    from dsl_tpu.core.anchors import anchor_generator_from_cfg

    cfg = dict(type="LegacyAnchorGenerator", center_offset=0.5,
               scales=[8], ratios=[0.5, 1.0, 2.0],
               strides=[4, 8, 16, 32, 64])
    theirs = ref.LegacyAnchorGenerator(
        strides=cfg["strides"], ratios=cfg["ratios"], scales=[8],
        center_offset=0.5)
    ours = anchor_generator_from_cfg(cfg)
    for lvl in range(5):
        np.testing.assert_allclose(
            ours.base_anchors(lvl),
            theirs.base_anchors[lvl].numpy(), atol=1e-4,
            err_msg=f"legacy rpn base anchors level {lvl}")


SSD_SIZES = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
SSD300 = dict(scale_major=False, input_size=300,
              basesize_ratio_range=(0.15, 0.9),
              strides=[8, 16, 32, 64, 100, 300],
              ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]])


@pytest.mark.parametrize("legacy", [False, True])
def test_ssd_anchor_generator_matches_reference(ref, legacy):
    from dsl_tpu.core.anchors import anchor_generator_from_cfg

    cls = ref.LegacySSDAnchorGenerator if legacy else ref.SSDAnchorGenerator
    kw = dict(SSD300)
    if legacy:
        kw.pop("scale_major")  # legacy ctor passes scale_major positionally
        theirs = cls(strides=kw["strides"], ratios=kw["ratios"],
                     basesize_ratio_range=kw["basesize_ratio_range"],
                     input_size=300, scale_major=False)
    else:
        theirs = cls(**kw)
    t = "LegacySSDAnchorGenerator" if legacy else "SSDAnchorGenerator"
    ours = anchor_generator_from_cfg(dict(SSD300, type=t))
    assert [ours.num_base_anchors_level(i) for i in range(6)] \
        == [a.shape[0] for a in theirs.base_anchors] == [4, 6, 6, 6, 4, 4]
    for lvl in range(6):
        np.testing.assert_allclose(
            ours.base_anchors(lvl),
            theirs.base_anchors[lvl].numpy(), atol=1e-4,
            err_msg=f"ssd base anchors level {lvl} (legacy={legacy})")
    ref_grids = _ref_grids(theirs, SSD_SIZES)
    for lvl, g in enumerate(ours.grid_anchors(SSD_SIZES)):
        np.testing.assert_allclose(np.asarray(g), ref_grids[lvl], atol=1e-3,
                                   err_msg=f"ssd grid level {lvl}")


def test_ssd512_ladder_matches_reference(ref):
    from dsl_tpu.core.anchors import anchor_generator_from_cfg

    kw = dict(scale_major=False, input_size=512,
              basesize_ratio_range=(0.1, 0.9),
              strides=[8, 16, 32, 64, 128, 256, 512],
              ratios=[[2], [2, 3], [2, 3], [2, 3], [2, 3], [2], [2]])
    theirs = ref.SSDAnchorGenerator(**kw)
    ours = anchor_generator_from_cfg(dict(kw, type="SSDAnchorGenerator"))
    assert ours.base_sizes == list(theirs.base_sizes)
    for lvl in range(7):
        np.testing.assert_allclose(
            ours.base_anchors(lvl),
            theirs.base_anchors[lvl].numpy(), atol=1e-4,
            err_msg=f"ssd512 base anchors level {lvl}")


def _load_reference_legacy_coder():
    import importlib.util

    path = ("/root/reference/mmdet/core/bbox/coder/"
            "legacy_delta_xywh_bbox_coder.py")
    base_path = "/root/reference/mmdet/core/bbox/coder/base_bbox_coder.py"
    saved = {k: sys.modules.get(k) for k in
             ("mmcv", "refcod", "refcod.coder", "refcod.coder.builder",
              "refcod.builder", "refcod.coder.base_bbox_coder",
              "refcod.coder.legacy")}
    try:
        mmcv = types.ModuleType("mmcv")
        mmcv.jit = lambda **kw: (lambda f: f)
        sys.modules["mmcv"] = mmcv
        for pkg in ("refcod", "refcod.coder"):
            mod = types.ModuleType(pkg)
            mod.__path__ = []
            sys.modules[pkg] = mod
        builder = types.ModuleType("refcod.builder")

        class _Reg:
            def register_module(self, *a, **k):
                return lambda cls: cls

        builder.BBOX_CODERS = _Reg()
        sys.modules["refcod.builder"] = builder

        def load(name, p):
            spec = importlib.util.spec_from_file_location(name, p)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
            return mod

        load("refcod.coder.base_bbox_coder", base_path)
        return load("refcod.coder.legacy", path)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_legacy_coder_matches_reference():
    """Random-tensor pin of legacy_bbox2delta / legacy_delta2bbox to the
    reference's own ``legacy_delta_xywh_bbox_coder.py`` torch code."""
    from dsl_tpu.core.boxes import legacy_bbox2delta, legacy_delta2bbox

    mod = _load_reference_legacy_coder()
    rng = np.random.RandomState(7)
    n = 64
    xy = rng.rand(n, 2).astype(np.float32) * 100
    wh = rng.rand(n, 2).astype(np.float32) * 60 + 2
    rois = np.concatenate([xy, xy + wh], axis=1)
    gxy = rng.rand(n, 2).astype(np.float32) * 100
    gwh = rng.rand(n, 2).astype(np.float32) * 60 + 2
    gts = np.concatenate([gxy, gxy + gwh], axis=1)
    means = (0.1, -0.1, 0.05, 0.2)
    stds = (0.1, 0.1, 0.2, 0.2)

    ref_enc = mod.legacy_bbox2delta(
        torch.from_numpy(rois), torch.from_numpy(gts), means, stds).numpy()
    ours_enc = np.asarray(legacy_bbox2delta(rois, gts, means, stds))
    np.testing.assert_allclose(ours_enc, ref_enc, rtol=1e-4, atol=1e-4)

    deltas = rng.randn(n, 8).astype(np.float32)   # 2 classes x 4
    ref_dec = mod.legacy_delta2bbox(
        torch.from_numpy(rois), torch.from_numpy(deltas), means,
        stds, max_shape=(120, 110)).numpy()
    ours_dec = np.asarray(legacy_delta2bbox(
        rois, deltas, means, stds, max_shape=(120, 110)))
    np.testing.assert_allclose(ours_dec, ref_dec, rtol=1e-4, atol=1e-3)


def _load_reference_iou_loss():
    import importlib.util

    saved = {k: sys.modules.get(k) for k in
             ("mmcv", "mmdet", "mmdet.core", "refloss", "refloss.builder",
              "refloss.losses", "refloss.losses.utils",
              "refloss.losses.iou_loss")}
    try:
        mmcv = types.ModuleType("mmcv")
        mmcv.jit = lambda **kw: (lambda f: f)
        sys.modules["mmcv"] = mmcv
        mmdet = types.ModuleType("mmdet")
        mmdet_core = types.ModuleType("mmdet.core")

        def _ref_overlaps(b1, b2, mode="iou", is_aligned=False, eps=1e-6):
            raise RuntimeError("not needed by diou/ciou")

        mmdet_core.bbox_overlaps = _ref_overlaps
        mmdet.core = mmdet_core
        sys.modules["mmdet"] = mmdet
        sys.modules["mmdet.core"] = mmdet_core
        for pkg in ("refloss", "refloss.losses"):
            mod = types.ModuleType(pkg)
            mod.__path__ = []
            sys.modules[pkg] = mod
        builder = types.ModuleType("refloss.builder")

        class _Reg:
            def register_module(self, *a, **k):
                return lambda cls: cls

        builder.LOSSES = _Reg()
        sys.modules["refloss.builder"] = builder

        def load(name, p):
            spec = importlib.util.spec_from_file_location(name, p)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
            return mod

        load("refloss.losses.utils",
             "/root/reference/mmdet/models/losses/utils.py")
        return load("refloss.losses.iou_loss",
                    "/root/reference/mmdet/models/losses/iou_loss.py")
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_diou_ciou_match_reference():
    from dsl_tpu.core.losses import diou_loss, ciou_loss

    mod = _load_reference_iou_loss()
    rng = np.random.RandomState(3)
    n = 128
    xy = rng.rand(n, 2).astype(np.float32) * 80
    wh = rng.rand(n, 2).astype(np.float32) * 50 + 1
    pred = np.concatenate([xy, xy + wh], axis=1)
    gxy = rng.rand(n, 2).astype(np.float32) * 80
    gwh = rng.rand(n, 2).astype(np.float32) * 50 + 1
    target = np.concatenate([gxy, gxy + gwh], axis=1)

    ref_d = mod.diou_loss(torch.from_numpy(pred), torch.from_numpy(target),
                          reduction="none").numpy()
    ours_d = np.asarray(diou_loss(pred, target, reduction="none"))
    np.testing.assert_allclose(ours_d, ref_d, rtol=1e-4, atol=1e-5)

    ref_c = mod.ciou_loss(torch.from_numpy(pred), torch.from_numpy(target),
                          reduction="none").numpy()
    ours_c = np.asarray(ciou_loss(pred, target, reduction="none"))
    np.testing.assert_allclose(ours_c, ref_c, rtol=1e-4, atol=1e-5)


def test_fast_nms_semantics():
    """Fast NMS keeps a box iff max IoU with a higher-scored same-class box
    is <= thr — including suppression by already-suppressed boxes (the
    defining difference from sequential NMS)."""
    from dsl_tpu.core.nms import fast_nms

    # low-overlap chain (pairwise IoU 0.33 <= thr): everything survives
    boxes = np.asarray([[0, 0, 10, 10],
                        [5, 0, 15, 10],
                        [10, 0, 20, 10]], np.float32)
    scores = np.asarray([[0.9], [0.8], [0.7]], np.float32)
    dets, labels, idx, valid = fast_nms(boxes, scores, score_thr=0.05,
                                        iou_threshold=0.4, max_num=3)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == {0, 1, 2}, kept
    boxes = np.asarray([[0, 0, 10, 10],
                        [2, 0, 12, 10],
                        [4, 0, 14, 10]], np.float32)
    scores = np.asarray([[0.9], [0.8], [0.7]], np.float32)
    dets, labels, idx, valid = fast_nms(boxes, scores, score_thr=0.05,
                                        iou_threshold=0.5, max_num=3)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    # A kills B (IoU 8/12=0.67); C vs B IoU 0.67 > 0.5 -> fast NMS kills C
    # even though C vs A IoU (6/14=0.43) passes
    assert kept == {0}, kept
    # classes are independent
    scores2 = np.asarray([[0.9, 0.0], [0.0, 0.8], [0.0, 0.0]], np.float32)
    _, labels2, idx2, valid2 = fast_nms(boxes, scores2, score_thr=0.05,
                                        iou_threshold=0.5, max_num=4)
    kept2 = {(int(l), int(i)) for l, i, v in
             zip(np.asarray(labels2), np.asarray(idx2), np.asarray(valid2))
             if v}
    assert kept2 == {(0, 0), (1, 1)}, kept2
