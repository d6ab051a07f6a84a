"""Oracles for the box-aware AutoAugment geometric/photometric transforms:
the reference's own ``mmdet/datasets/pipelines/auto_augment.py`` (Shear,
Rotate, Translate, Color/Equalize/Brightness/Contrast) executed with the
mmcv image ops stubbed by OUR ``dsl_tpu/data/pipelines/geometric.py``
helpers — so both sides share the pixel warps and the oracle pins the
mmdet-level logic that actually differs per implementation: the bbox
corner transforms, clip order, empty-box + label/mask filtering, fill
value plumbing, level→magnitude mappings, and rng gating.

Skipped automatically when /root/reference is unavailable.
"""

import copy
import os.path as osp
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/mmdet"
REF_AA = osp.join(REF_ROOT, "datasets/pipelines/auto_augment.py")

pytestmark = pytest.mark.skipif(not osp.exists(REF_AA),
                                reason="reference tree not available")


def _load_reference_aa():
    import importlib.util

    from dsl_tpu.data.pipelines import geometric as G

    new_mods = {}

    def _stub(name):
        mod = types.ModuleType(name)
        new_mods[name] = mod
        return mod

    class _Reg:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    mmcv = _stub("mmcv")
    mmcv.imshear = G.imshear
    mmcv.imtranslate = G.imtranslate
    mmcv.imrotate = G.imrotate
    mmcv.adjust_color = G.adjust_color
    mmcv.imequalize = G.imequalize
    mmcv.adjust_brightness = G.adjust_brightness
    mmcv.adjust_contrast = G.adjust_contrast
    for pkg in ("refaa", "refaa.datasets", "refaa.datasets.pipelines"):
        _stub(pkg)
    builder = _stub("refaa.datasets.builder")
    builder.PIPELINES = _Reg()
    compose = _stub("refaa.datasets.pipelines.compose")
    compose.Compose = object

    saved = {k: sys.modules.get(k) for k in set(new_mods)}
    sys.modules.update(new_mods)
    try:
        spec = importlib.util.spec_from_file_location(
            "refaa.datasets.pipelines.auto_augment", REF_AA)
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = "refaa.datasets.pipelines"
        sys.modules["refaa.datasets.pipelines.auto_augment"] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        sys.modules.pop("refaa.datasets.pipelines.auto_augment", None)


@pytest.fixture(scope="module")
def ref_mod():
    return _load_reference_aa()


def _results(seed=0, h=37, w=53, n=6):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3), np.uint8)
    x1 = rng.uniform(0, w - 10, n)
    y1 = rng.uniform(0, h - 10, n)
    boxes = np.stack([x1, y1, x1 + rng.uniform(2, 25, n),
                      y1 + rng.uniform(2, 20, n)], 1).astype(np.float32)
    ig = boxes[:2] + rng.uniform(-3, 3, (2, 4)).astype(np.float32)
    seg = rng.randint(0, 5, (h, w), np.uint8)
    return dict(
        img=img, img_shape=(h, w, 3),
        gt_bboxes=boxes, gt_labels=rng.randint(0, 4, n).astype(np.int64),
        gt_bboxes_ignore=ig.astype(np.float32),
        bbox_fields=["gt_bboxes", "gt_bboxes_ignore"],
        mask_fields=[], seg_fields=["gt_semantic_seg"],
        gt_semantic_seg=seg)


def _compare(ref_r, our_r):
    np.testing.assert_array_equal(our_r["img"], ref_r["img"])
    np.testing.assert_array_equal(our_r["gt_semantic_seg"],
                                  ref_r["gt_semantic_seg"])
    for key in ("gt_bboxes", "gt_bboxes_ignore"):
        assert our_r[key].shape == ref_r[key].shape, key
        np.testing.assert_allclose(our_r[key], ref_r[key], rtol=1e-5,
                                   atol=1e-4, err_msg=key)
    np.testing.assert_array_equal(our_r["gt_labels"], ref_r["gt_labels"])


@pytest.mark.parametrize("direction", ["horizontal", "vertical"])
@pytest.mark.parametrize("neg", [0.0, 1.0])
def test_shear_matches_reference(ref_mod, direction, neg):
    from dsl_tpu.data.pipelines.geometric import Shear

    kw = dict(level=7, prob=1.0, direction=direction,
              random_negative_prob=neg, img_fill_val=101)
    ref_r = ref_mod.Shear(**kw)(_results(1))
    our_r = Shear(**kw)(_results(1))
    _compare(ref_r, our_r)


@pytest.mark.parametrize("center,scale", [(None, 1.0), ((10.0, 20.0), 1.3)])
@pytest.mark.parametrize("neg", [0.0, 1.0])
def test_rotate_matches_reference(ref_mod, center, scale, neg):
    from dsl_tpu.data.pipelines.geometric import Rotate

    kw = dict(level=8, prob=1.0, center=center, scale=scale,
              max_rotate_angle=30, random_negative_prob=neg)
    ref_r = ref_mod.Rotate(**kw)(_results(2))
    our_r = Rotate(**kw)(_results(2))
    _compare(ref_r, our_r)


@pytest.mark.parametrize("direction", ["horizontal", "vertical"])
@pytest.mark.parametrize("neg", [0.0, 1.0])
def test_translate_matches_reference(ref_mod, direction, neg):
    from dsl_tpu.data.pipelines.geometric import Translate

    # level 1 -> 25px: boxes get shifted, some clipped away entirely
    kw = dict(level=1, prob=1.0, direction=direction,
              random_negative_prob=neg, img_fill_val=7)
    ref_r = ref_mod.Translate(**kw)(_results(3))
    our_r = Translate(**kw)(_results(3))
    _compare(ref_r, our_r)


def test_color_transforms_match_reference(ref_mod):
    from dsl_tpu.data.pipelines import geometric as G

    for ref_cls, our_cls, kw in (
            (ref_mod.ColorTransform, G.ColorTransform, dict(level=6)),
            (ref_mod.EqualizeTransform, G.EqualizeTransform, dict()),
            (ref_mod.BrightnessTransform, G.BrightnessTransform,
             dict(level=3)),
            (ref_mod.ContrastTransform, G.ContrastTransform,
             dict(level=9))):
        kw = dict(kw, prob=1.0)
        ref_r = ref_cls(**kw)(_results(4))
        our_r = our_cls(**kw)(_results(4))
        np.testing.assert_array_equal(our_r["img"], ref_r["img"]), ref_cls


def test_shear_masks_match_reference_structures(ref_mod):
    """Our BitmapMasks.shear/rotate/translate vs the reference's
    BitmapMasks (structures.py, same mmcv stubs) on random bitmaps."""
    from test_torch_oracle_masks import _load_reference_masks

    from dsl_tpu.core.masks import BitmapMasks as Ours

    ref = _load_reference_masks()
    rng = np.random.RandomState(9)
    m = (rng.rand(3, 24, 31) > 0.6).astype(np.uint8)
    r = ref.BitmapMasks(m.copy(), 24, 31)
    o = Ours(m.copy(), 24, 31)
    np.testing.assert_array_equal(
        o.shear((24, 31), 0.3, "horizontal").masks,
        r.shear((24, 31), 0.3, "horizontal").to_ndarray())
    np.testing.assert_array_equal(
        o.rotate((24, 31), 17.0).masks,
        r.rotate((24, 31), 17.0).to_ndarray())
    np.testing.assert_array_equal(
        o.translate((24, 31), 5, "vertical").masks,
        r.translate((24, 31), 5, "vertical").to_ndarray())
