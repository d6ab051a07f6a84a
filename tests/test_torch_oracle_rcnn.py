"""Torch oracles for the two-stage tier (RPN loss + RoI bbox-head loss)
against the reference's OWN code.

Runs the reference's actual ``RPNHead.loss`` (``AnchorHead.loss`` with
RandomSampler subsampling, ``/root/reference/mmdet/models/dense_heads/
anchor_head.py:440-489``) and ``BBoxHead.get_targets + loss``
(``/root/reference/mmdet/models/roi_heads/bbox_heads/bbox_head.py:
180-311``) on CPU — together with the real ``MaxIoUAssigner`` /
``RandomSampler`` / ``DeltaXYWHBBoxCoder`` / loss modules from the
reference tree (mmcv and the registries stubbed) — and asserts our
``rpn_loss`` / ``sample_batch_rois + rcnn_bbox_loss`` reproduce every
component to fp32 tolerance.

Sampler determinism: the RandomSampler only randomizes when it must
TRUNCATE a candidate set; every scenario here keeps
``num >= #candidates`` (RPN: ``num`` above the anchor count; RCNN:
few proposals vs num=512), so both sides sample the full pos/neg sets
and the comparison is exact. The truncating path (pos cap + random
negative fill) is covered by our own unit tests.

Pins: MaxIoU assignment (incl. min_pos_iou and the match_low_quality
rule), num_total_samples averaging for BOTH rpn losses, the rcnn reg
average over ALL sampled rois (``bbox_head.py:302``), L1-vs-SmoothL1
loss-config handling, and class-agnostic regression.

Skipped automatically when /root/reference or torch is unavailable.
"""

import os.path as osp
import sys
import types
from functools import partial

import numpy as np
import pytest

REF_ROOT = "/root/reference/mmdet"
REF_RPN = osp.join(REF_ROOT, "models/dense_heads/rpn_head.py")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not osp.exists(REF_RPN),
                                reason="reference tree not available")

NUM_CLASSES = 5
STRIDES = (4, 8, 16)
SIZES = [(16, 20), (8, 10), (4, 5)]
IMG_HW = (64, 80)
K_GT = 6


# ---------------------------------------------------------------------------
# Load the reference two-stage modules with mmcv / registries stubbed.
# ---------------------------------------------------------------------------

def _load_reference_rcnn():
    import importlib.util
    import torch.nn as nn

    new_mods = {}

    def _stub(name):
        mod = types.ModuleType(name)
        new_mods[name] = mod
        return mod

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        new_mods[name] = mod
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    # ---- mmcv stubs -------------------------------------------------------
    mmcv = _stub("mmcv")
    mmcv.jit = lambda **kw: (lambda f: f)
    mmcv_cnn = _stub("mmcv.cnn")
    mmcv_cnn.normal_init = lambda *a, **k: None
    mmcv_runner = _stub("mmcv.runner")
    mmcv_runner.force_fp32 = lambda **kw: (lambda f: f)
    mmcv_runner.auto_fp16 = lambda **kw: (lambda f: f)

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

    mmcv_runner.BaseModule = BaseModule
    mmcv_ops = _stub("mmcv.ops")
    mmcv_ops.batched_nms = None     # proposal-path only, not the loss
    mmcv.cnn, mmcv.runner, mmcv.ops = mmcv_cnn, mmcv_runner, mmcv_ops

    # ---- registry / builder stubs -----------------------------------------
    class _Reg:
        def __init__(self):
            self.classes = {}

        def register_module(self, *a, **k):
            def deco(cls):
                self.classes[cls.__name__] = cls
                return cls
            return deco

    regs = {n: _Reg() for n in
            ("LOSSES", "HEADS", "PRIOR_GENERATORS", "BBOX_ASSIGNERS",
             "BBOX_SAMPLERS", "BBOX_CODERS", "IOU_CALCULATORS")}

    def _build(reg):
        def build(cfg, **kw):
            cfg = dict(cfg)
            return regs[reg].classes[cfg.pop("type")](**cfg, **kw)
        return build

    mm_utils = _stub("mmdet.utils")

    class NiceRepr:
        def __repr__(self):
            return self.__class__.__name__

    util_mixins = types.ModuleType("mmdet.utils.util_mixins")
    util_mixins.NiceRepr = NiceRepr
    mm_utils.util_mixins = util_mixins
    new_mods["mmdet.utils.util_mixins"] = util_mixins

    for pkg in ("refrc", "refrc.core", "refrc.core.anchor",
                "refrc.core.bbox", "refrc.core.bbox.assigners",
                "refrc.core.bbox.samplers", "refrc.core.bbox.coder",
                "refrc.core.bbox.iou_calculators", "refrc.models",
                "refrc.models.losses", "refrc.models.dense_heads",
                "refrc.models.roi_heads", "refrc.models.roi_heads.bbox_heads"):
        _stub(pkg)
    anchor_builder = _stub("refrc.core.anchor.builder")
    anchor_builder.PRIOR_GENERATORS = regs["PRIOR_GENERATORS"]
    anchor_builder.ANCHOR_GENERATORS = regs["PRIOR_GENERATORS"]
    bbox_builder = _stub("refrc.core.bbox.builder")
    bbox_builder.BBOX_ASSIGNERS = regs["BBOX_ASSIGNERS"]
    bbox_builder.BBOX_SAMPLERS = regs["BBOX_SAMPLERS"]
    bbox_builder.BBOX_CODERS = regs["BBOX_CODERS"]
    iou_builder = _stub("refrc.core.bbox.iou_calculators.builder")
    iou_builder.IOU_CALCULATORS = regs["IOU_CALCULATORS"]
    models_builder = _stub("refrc.models.builder")
    models_builder.HEADS = regs["HEADS"]
    models_builder.LOSSES = regs["LOSSES"]
    models_builder.build_loss = _build("LOSSES")

    saved = {k: sys.modules.get(k)
             for k in set(new_mods) | {"mmdet", "mmdet.core",
                                       "mmdet.core.bbox", "mmdet.utils",
                                       "mmdet.utils.util_mixins",
                                       "mmdet.models",
                                       "mmdet.models.builder",
                                       "mmdet.models.losses",
                                       "mmdet.models.utils"}}
    sys.modules.update(new_mods)
    sys.modules["mmdet.utils"] = mm_utils
    try:
        iou2d = _load(
            "refrc.core.bbox.iou_calculators.iou2d_calculator",
            osp.join(REF_ROOT,
                     "core/bbox/iou_calculators/iou2d_calculator.py"))
        iou_pkg = sys.modules["refrc.core.bbox.iou_calculators"]
        iou_pkg.build_iou_calculator = _build("IOU_CALCULATORS")
        anchor_utils = _load("refrc.core.anchor.utils",
                             osp.join(REF_ROOT, "core/anchor/utils.py"))
        _load("refrc.core.anchor.anchor_generator",
              osp.join(REF_ROOT, "core/anchor/anchor_generator.py"))
        _load("refrc.core.bbox.coder.base_bbox_coder",
              osp.join(REF_ROOT, "core/bbox/coder/base_bbox_coder.py"))
        _load("refrc.core.bbox.coder.delta_xywh_bbox_coder",
              osp.join(REF_ROOT,
                       "core/bbox/coder/delta_xywh_bbox_coder.py"))
        _load("refrc.core.bbox.assigners.base_assigner",
              osp.join(REF_ROOT, "core/bbox/assigners/base_assigner.py"))
        _load("refrc.core.bbox.assigners.assign_result",
              osp.join(REF_ROOT, "core/bbox/assigners/assign_result.py"))
        _load("refrc.core.bbox.assigners.max_iou_assigner",
              osp.join(REF_ROOT,
                       "core/bbox/assigners/max_iou_assigner.py"))
        _load("refrc.core.bbox.samplers.sampling_result",
              osp.join(REF_ROOT, "core/bbox/samplers/sampling_result.py"))
        _load("refrc.core.bbox.samplers.base_sampler",
              osp.join(REF_ROOT, "core/bbox/samplers/base_sampler.py"))
        # RandomSampler pulls mmdet.core.bbox.demodata.ensure_rng
        mm_core_bbox = types.ModuleType("mmdet.core.bbox")
        demodata = types.ModuleType("mmdet.core.bbox.demodata")
        demodata.ensure_rng = lambda rng=None: np.random.RandomState(rng)
        mm_core_bbox.demodata = demodata
        sys.modules["mmdet.core.bbox"] = mm_core_bbox
        sys.modules["mmdet.core.bbox.demodata"] = demodata
        rnd = _load("refrc.core.bbox.samplers.random_sampler",
                    osp.join(REF_ROOT,
                             "core/bbox/samplers/random_sampler.py"))

        def multi_apply(func, *args, **kwargs):
            pfunc = partial(func, **kwargs) if kwargs else func
            return tuple(map(list, zip(*map(pfunc, *args))))

        def unmap(data, count, inds, fill=0):
            inds = inds.type(torch.bool)
            if data.dim() == 1:
                ret = data.new_full((count,), fill)
                ret[inds] = data
            else:
                ret = data.new_full((count,) + data.size()[1:], fill)
                ret[inds, :] = data
            return ret

        mmdet_core = types.ModuleType("mmdet.core")
        mmdet_core.bbox_overlaps = iou2d.bbox_overlaps
        mmdet_core.multi_apply = multi_apply
        mmdet_core.unmap = unmap
        mmdet_core.anchor_inside_flags = anchor_utils.anchor_inside_flags
        mmdet_core.images_to_levels = anchor_utils.images_to_levels
        mmdet_core.multiclass_nms = None
        mmdet_core.build_anchor_generator = _build("PRIOR_GENERATORS")
        mmdet_core.build_assigner = _build("BBOX_ASSIGNERS")
        mmdet_core.build_sampler = _build("BBOX_SAMPLERS")
        mmdet_core.build_bbox_coder = _build("BBOX_CODERS")
        mmdet_core.build_prior_generator = _build("PRIOR_GENERATORS")
        mmdet_mod = types.ModuleType("mmdet")
        mmdet_mod.core = mmdet_core
        mmdet_mod.utils = mm_utils
        sys.modules["mmdet"] = mmdet_mod
        sys.modules["mmdet.core"] = mmdet_core

        _load("refrc.models.losses.utils",
              osp.join(REF_ROOT, "models/losses/utils.py"))
        ce = _load("refrc.models.losses.cross_entropy_loss",
                   osp.join(REF_ROOT,
                            "models/losses/cross_entropy_loss.py"))
        sl1 = _load("refrc.models.losses.smooth_l1_loss",
                    osp.join(REF_ROOT, "models/losses/smooth_l1_loss.py"))
        acc = _load("refrc.models.losses.accuracy",
                    osp.join(REF_ROOT, "models/losses/accuracy.py"))

        # mmdet.models.* facade used by bbox_head.py's absolute imports
        mm_models = types.ModuleType("mmdet.models")
        mm_models_builder = types.ModuleType("mmdet.models.builder")
        mm_models_builder.HEADS = regs["HEADS"]
        mm_models_builder.build_loss = _build("LOSSES")
        mm_losses = types.ModuleType("mmdet.models.losses")
        mm_losses.accuracy = acc.accuracy
        mm_models_utils = types.ModuleType("mmdet.models.utils")

        def build_linear_layer(cfg, *args, **kwargs):
            return torch.nn.Linear(*args, **kwargs)

        mm_models_utils.build_linear_layer = build_linear_layer
        mm_models.builder = mm_models_builder
        mm_models.losses = mm_losses
        mm_models.utils = mm_models_utils
        for k, v in (("mmdet.models", mm_models),
                     ("mmdet.models.builder", mm_models_builder),
                     ("mmdet.models.losses", mm_losses),
                     ("mmdet.models.utils", mm_models_utils)):
            sys.modules[k] = v

        _load("refrc.models.dense_heads.base_dense_head",
              osp.join(REF_ROOT, "models/dense_heads/base_dense_head.py"))
        mixins = _stub("refrc.models.dense_heads.dense_test_mixins")

        class BBoxTestMixin:
            pass

        mixins.BBoxTestMixin = BBoxTestMixin
        sys.modules["refrc.models.dense_heads.dense_test_mixins"] = mixins
        _load("refrc.models.dense_heads.anchor_head",
              osp.join(REF_ROOT, "models/dense_heads/anchor_head.py"))
        rpn = _load("refrc.models.dense_heads.rpn_head", REF_RPN)
        bh = _load("refrc.models.roi_heads.bbox_heads.bbox_head",
                   osp.join(REF_ROOT,
                            "models/roi_heads/bbox_heads/bbox_head.py"))
        asn = sys.modules["refrc.core.bbox.assigners.max_iou_assigner"]
        return types.SimpleNamespace(
            RPNHead=rpn.RPNHead, BBoxHead=bh.BBoxHead,
            MaxIoUAssigner=asn.MaxIoUAssigner,
            RandomSampler=rnd.RandomSampler,
            CrossEntropyLoss=ce.CrossEntropyLoss)
    finally:
        # the RandomSampler lazily imports mmdet.core.bbox.demodata at
        # CONSTRUCTION time (inside the tests), so the fake mmdet tree must
        # outlive the loader; everything else is restored.
        keep = {"mmdet", "mmdet.core", "mmdet.core.bbox",
                "mmdet.core.bbox.demodata"}
        for k, v in saved.items():
            if k in keep and v is None:
                continue
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def ref_mod():
    return _load_reference_rcnn()


class _Cfg(dict):
    """mmcv-Config-style attribute access over a plain dict."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _make_gts(seed, gt_counts):
    rng = np.random.RandomState(seed)
    H, W = IMG_HW
    gts, gt_labels = [], []
    for n in gt_counts:
        x1 = rng.rand(n) * W * 0.6
        y1 = rng.rand(n) * H * 0.6
        bw = rng.rand(n) * (W * 0.4) + 6.0
        bh = rng.rand(n) * (H * 0.4) + 6.0
        gts.append(np.stack([x1, y1, np.minimum(x1 + bw, W - 1),
                             np.minimum(y1 + bh, H - 1)],
                            -1).astype(np.float32))
        gt_labels.append(rng.randint(0, NUM_CLASSES, size=n)
                         .astype(np.int64))
    return gts, gt_labels


def _pad_gts(gts, gt_labels):
    b = len(gts)
    gt_b = np.zeros((b, K_GT, 4), np.float32)
    gt_l = np.zeros((b, K_GT), np.int32)
    gt_v = np.zeros((b, K_GT), bool)
    for i, g in enumerate(gts):
        gt_b[i, :len(g)] = g
        gt_l[i, :len(g)] = gt_labels[i]
        gt_v[i, :len(g)] = True
    return gt_b, gt_l, gt_v


# ---------------------------------------------------------------------------
# RPN loss oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("loss_bbox_cfg", [
    dict(type="L1Loss", loss_weight=1.0),
    dict(type="SmoothL1Loss", beta=1.0 / 9.0, loss_weight=1.0),
])
def test_rpn_loss_matches_reference(ref_mod, loss_bbox_cfg):
    """Full-sample RPN oracle: MaxIoU(0.7/0.3, min_pos_iou=0.3,
    low-quality match) + num_total_samples averaging of BCE and the
    configured reg loss. ``sampler.num`` exceeds the anchor count so the
    RandomSampler takes every positive and negative deterministically."""
    B = 2
    rng = np.random.RandomState(3)
    na = 3
    cls = [rng.randn(B, na, h, w).astype(np.float32) for h, w in SIZES]
    bbox = [(rng.randn(B, na * 4, h, w) * 0.3).astype(np.float32)
            for h, w in SIZES]
    gts, gt_labels = _make_gts(7, [3, 4])
    num_anchors = sum(na * h * w for h, w in SIZES)
    sampler_cfg = dict(type="RandomSampler", num=4 * num_anchors,
                       pos_fraction=0.5, neg_pos_ub=-1,
                       add_gt_as_proposals=False)

    head = ref_mod.RPNHead(
        in_channels=16, feat_channels=16,
        anchor_generator=dict(type="AnchorGenerator", scales=[8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=list(STRIDES)),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0] * 4, target_stds=[1.0] * 4),
        loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True,
                      loss_weight=1.0),
        loss_bbox=dict(loss_bbox_cfg),
        train_cfg=_Cfg(assigner=dict(type="MaxIoUAssigner",
                                     pos_iou_thr=0.7, neg_iou_thr=0.3,
                                     min_pos_iou=0.3,
                                     match_low_quality=True,
                                     ignore_iof_thr=-1),
                       sampler=dict(sampler_cfg),
                       allowed_border=-1, pos_weight=-1, debug=False))
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(b) for b in bbox],
                        [t(g) for g in gts], metas)
    ref = {k: float(sum(v) if isinstance(v, list) else v)
           for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.rpn_head import RPNHead, rpn_loss

    our_head = RPNHead(in_channels=16, feat_channels=16, strides=STRIDES,
                       loss_bbox=dict(loss_bbox_cfg))
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = rpn_loss(
        our_head, nhwc(cls), nhwc(bbox),
        dict(gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v)),
        train_cfg=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                     min_pos_iou=0.3,
                                     match_low_quality=True),
                       sampler=dict(num=4 * num_anchors,
                                    pos_fraction=0.5)))
    for ok, rk in (("loss_rpn_cls", "loss_rpn_cls"),
                   ("loss_rpn_bbox", "loss_rpn_bbox")):
        np.testing.assert_allclose(
            float(ours[ok]), ref[rk], rtol=5e-5, atol=1e-6,
            err_msg=f"{ok}: ours={float(ours[ok])} ref={ref[rk]}")


def test_rpn_loss_allowed_border_matches_reference(ref_mod):
    """The standalone ``configs/rpn/*`` train_cfg uses ``allowed_border=0``:
    anchors sticking out of the image (``anchor_inside_flags``) are excluded
    from assignment and averaging entirely — this pins our dense inside-mask
    equivalent of the reference's filter-then-unmap."""
    B = 2
    rng = np.random.RandomState(23)
    na = 3
    cls = [rng.randn(B, na, h, w).astype(np.float32) for h, w in SIZES]
    bbox = [(rng.randn(B, na * 4, h, w) * 0.3).astype(np.float32)
            for h, w in SIZES]
    gts, gt_labels = _make_gts(29, [3, 4])
    num_anchors = sum(na * h * w for h, w in SIZES)

    head = ref_mod.RPNHead(
        in_channels=16, feat_channels=16,
        anchor_generator=dict(type="AnchorGenerator", scales=[8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=list(STRIDES)),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0] * 4, target_stds=[1.0] * 4),
        loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True,
                      loss_weight=1.0),
        loss_bbox=dict(type="L1Loss", loss_weight=1.0),
        train_cfg=_Cfg(assigner=dict(type="MaxIoUAssigner",
                                     pos_iou_thr=0.7, neg_iou_thr=0.3,
                                     min_pos_iou=0.3,
                                     match_low_quality=True,
                                     ignore_iof_thr=-1),
                       sampler=dict(type="RandomSampler",
                                    num=4 * num_anchors, pos_fraction=0.5,
                                    neg_pos_ub=-1,
                                    add_gt_as_proposals=False),
                       allowed_border=0, pos_weight=-1, debug=False))
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(b) for b in bbox],
                        [t(g) for g in gts], metas)
    ref = {k: float(sum(v) if isinstance(v, list) else v)
           for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.rpn_head import RPNHead, rpn_loss

    our_head = RPNHead(in_channels=16, feat_channels=16, strides=STRIDES,
                       loss_bbox=dict(type="L1Loss", loss_weight=1.0))
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = rpn_loss(
        our_head, nhwc(cls), nhwc(bbox),
        dict(gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v),
             img_shapes=jnp.asarray([[IMG_HW[0], IMG_HW[1]]] * B,
                                    dtype=jnp.float32)),
        train_cfg=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                     min_pos_iou=0.3,
                                     match_low_quality=True),
                       sampler=dict(num=4 * num_anchors,
                                    pos_fraction=0.5),
                       allowed_border=0))
    for ok, rk in (("loss_rpn_cls", "loss_rpn_cls"),
                   ("loss_rpn_bbox", "loss_rpn_bbox")):
        np.testing.assert_allclose(
            float(ours[ok]), ref[rk], rtol=5e-5, atol=1e-6,
            err_msg=f"{ok}: ours={float(ours[ok])} ref={ref[rk]}")


# ---------------------------------------------------------------------------
# RCNN bbox-head loss oracle
# ---------------------------------------------------------------------------

def _fake_preds(rois_abs, img_idx, cls_dim, reg_dim, seed=5):
    """Deterministic order-invariant pseudo-predictions: a fixed random
    projection of (img_idx, box coords) — identical rows on both sides
    regardless of each sampler's internal ordering."""
    rng = np.random.RandomState(seed)
    w1 = rng.randn(5, cls_dim).astype(np.float32)
    w2 = rng.randn(5, reg_dim).astype(np.float32)
    feat = np.concatenate([img_idx[:, None].astype(np.float32),
                           rois_abs / 16.0], axis=1)
    return (np.sin(feat @ w1) * 2.0).astype(np.float32), \
        (np.sin(feat @ w2) * 0.2).astype(np.float32)


def _make_proposals(seed, b, p):
    rng = np.random.RandomState(seed)
    H, W = IMG_HW
    x1 = rng.rand(b, p) * W * 0.7
    y1 = rng.rand(b, p) * H * 0.7
    bw = rng.rand(b, p) * (W * 0.5) + 4.0
    bh = rng.rand(b, p) * (H * 0.5) + 4.0
    return np.stack([x1, y1, np.minimum(x1 + bw, W - 1),
                     np.minimum(y1 + bh, H - 1)], -1).astype(np.float32)


@pytest.mark.parametrize(
    "loss_bbox_cfg,reg_class_agnostic,assigner_kw", [
        (dict(type="L1Loss", loss_weight=1.0), False,
         dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
              match_low_quality=False)),
        (dict(type="SmoothL1Loss", beta=1.0, loss_weight=1.0), True,
         dict(pos_iou_thr=0.6, neg_iou_thr=0.6, min_pos_iou=0.6,
              match_low_quality=False)),
        (dict(type="L1Loss", loss_weight=2.0), False,
         dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.3,
              match_low_quality=True)),
    ])
def test_rcnn_bbox_loss_matches_reference(ref_mod, loss_bbox_cfg,
                                          reg_class_agnostic, assigner_kw):
    """Assign + sample + target + loss oracle for the RoI bbox head:
    reference ``MaxIoUAssigner`` → ``RandomSampler`` (gt added as
    candidates, no truncation at num=512) → ``BBoxHead.get_targets`` +
    ``loss`` vs our ``sample_batch_rois`` + ``rcnn_bbox_loss`` on
    identical order-invariant pseudo-predictions."""
    B, P = 2, 16
    proposals = _make_proposals(21, B, P)
    gts, gt_labels = _make_gts(22, [3, 5])
    stds = (0.1, 0.1, 0.2, 0.2)
    t = torch.from_numpy

    assigner = ref_mod.MaxIoUAssigner(ignore_iof_thr=-1, **assigner_kw)
    sampler = ref_mod.RandomSampler(num=512, pos_fraction=0.25,
                                    neg_pos_ub=-1, add_gt_as_proposals=True)
    head = ref_mod.BBoxHead(
        with_avg_pool=True, roi_feat_size=1, in_channels=8,
        num_classes=NUM_CLASSES,
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0] * 4, target_stds=list(stds)),
        reg_class_agnostic=reg_class_agnostic,
        loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=False,
                      loss_weight=1.0),
        loss_bbox=dict(loss_bbox_cfg))

    results, all_rois, all_idx = [], [], []
    for i in range(B):
        ar = assigner.assign(t(proposals[i]), t(gts[i]), None,
                             t(gt_labels[i]))
        res = sampler.sample(ar, t(proposals[i]), t(gts[i]),
                             t(gt_labels[i]))
        results.append(res)
        rois_i = torch.cat([res.pos_bboxes, res.neg_bboxes], dim=0)
        all_rois.append(rois_i.numpy())
        all_idx.append(np.full(len(rois_i), i, np.int64))
    labels, label_weights, bbox_targets, bbox_weights = head.get_targets(
        results, [t(g) for g in gts], [t(l) for l in gt_labels],
        _Cfg(pos_weight=-1))
    rois_np = np.concatenate(all_rois, 0)
    idx_np = np.concatenate(all_idx, 0)
    reg_dim = 4 if reg_class_agnostic else NUM_CLASSES * 4
    cls_np, reg_np = _fake_preds(rois_np, idx_np, NUM_CLASSES + 1, reg_dim)
    with torch.no_grad():
        ref = head.loss(t(cls_np), t(reg_np), None, labels, label_weights,
                        bbox_targets, bbox_weights)
    ref = {k: float(v) for k, v in ref.items()}

    import jax
    import jax.numpy as jnp
    from dsl_tpu.models.roi_heads.standard_roi_head import (
        Shared2FCBBoxHead, rcnn_bbox_loss, sample_batch_rois)

    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    batch = dict(gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
                 gt_valid=jnp.asarray(gt_v))
    samples = sample_batch_rois(
        jnp.asarray(proposals), jnp.ones((B, P), bool), batch,
        jax.random.PRNGKey(0), NUM_CLASSES, num_samples=512,
        pos_fraction=0.25, add_gt_as_proposals=True, **assigner_kw)
    # sanity: the sampled sets agree (pos count per image)
    ref_pos = sum(len(r.pos_bboxes) for r in results)
    our_pos = int(np.asarray(samples["is_pos"]).sum())
    assert our_pos == ref_pos
    assert int(np.asarray(samples["valid"]).sum()) == len(rois_np)

    our_rois = np.asarray(samples["rois"]).reshape(-1, 4)
    # fixed-shape output rows per image = min(num_samples, P + K_GT)
    our_idx = np.repeat(np.arange(B), samples["rois"].shape[1])
    our_cls, our_reg = _fake_preds(our_rois, our_idx, NUM_CLASSES + 1,
                                   reg_dim)
    our_head = Shared2FCBBoxHead(
        num_classes=NUM_CLASSES, target_stds=stds,
        reg_class_agnostic=reg_class_agnostic,
        loss_bbox=dict(loss_bbox_cfg))
    ours = rcnn_bbox_loss(our_head, jnp.asarray(our_cls),
                          jnp.asarray(our_reg), samples, batch)
    for k in ("loss_cls", "loss_bbox"):
        np.testing.assert_allclose(
            float(ours[k]), ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={float(ours[k])} ref={ref[k]}")
    np.testing.assert_allclose(float(ours["acc"]), ref["acc"] / 100.0,
                               rtol=1e-5, atol=1e-6)


def _pt_batched_nms_local(boxes, scores, idxs, nms_cfg):
    import sys as _sys
    import os.path as _osp

    _sys.path.insert(0, _osp.dirname(__file__))
    from test_torch_oracle_postproc import _pt_batched_nms

    return _pt_batched_nms(boxes, scores, idxs, nms_cfg)


def test_rpn_proposals_match_reference(ref_mod):
    """RPN proposal generation (``rpn_head.py get_bboxes:79-230``):
    per-level sigmoid + nms_pre sort-topk, decode + clip to img_shape,
    min_bbox_size filter, NMS with LEVEL-ID separation, top max_per_img.
    (Regression: we used to NMS across levels without the level ids.)"""
    rng = np.random.RandomState(4)
    B = 2
    cls = [rng.randn(B, 3, h, w).astype(np.float32) for h, w in SIZES]
    reg = [rng.randn(B, 12, h, w).astype(np.float32) * 0.4
           for h, w in SIZES]

    head = ref_mod.RPNHead(
        in_channels=16, feat_channels=16,
        anchor_generator=dict(type="AnchorGenerator", scales=[8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=list(STRIDES)),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0] * 4, target_stds=[1.0] * 4),
        loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True,
                      loss_weight=1.0),
        loss_bbox=dict(type="L1Loss", loss_weight=1.0))
    gb = type(head)._get_bboxes_single.__globals__
    gb["batched_nms"] = _pt_batched_nms_local
    metas = [dict(img_shape=(*IMG_HW, 3), scale_factor=1.0)
             for _ in range(B)]
    cfg = _Cfg(nms_pre=60, max_per_img=25, min_bbox_size=0,
               nms=_Cfg(type="nms", iou_threshold=0.7))
    t = torch.from_numpy
    with torch.no_grad():
        ref = head.get_bboxes([t(c) for c in cls], [t(r) for r in reg],
                              metas, cfg=cfg)

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.rpn_head import RPNHead, rpn_proposals

    our_head = RPNHead(in_channels=16, feat_channels=16, strides=STRIDES)
    nhwc = lambda arrs: [jnp.asarray(a.transpose(0, 2, 3, 1)) for a in arrs]
    boxes, scores, valid = rpn_proposals(
        our_head, nhwc(cls), nhwc(reg),
        img_shapes=jnp.asarray([[IMG_HW[0], IMG_HW[1]]] * B, jnp.float32),
        nms_pre=60, nms_iou=0.7, num_proposals=25, min_bbox_size=0.0)
    for bi in range(B):
        rd = ref[bi].numpy() if not isinstance(ref[bi], tuple) \
            else ref[bi][0].numpy()
        m = np.asarray(valid[bi])
        ob = np.asarray(boxes[bi])[m]
        osc = np.asarray(scores[bi])[m]
        assert len(ob) == len(rd), (bi, len(ob), len(rd))
        order_o = np.argsort(-osc, kind="mergesort")
        order_r = np.argsort(-rd[:, 4], kind="mergesort")
        np.testing.assert_allclose(ob[order_o], rd[order_r, :4],
                                   rtol=1e-4, atol=1e-3,
                                   err_msg=f"img {bi}")
        np.testing.assert_allclose(osc[order_o], rd[order_r, 4],
                                   rtol=1e-5, atol=1e-6)


def test_rcnn_bbox_decode_nms_matches_reference(ref_mod):
    """RoI bbox predict (``bbox_head.py get_bboxes:309-380``): softmax over
    C+1, per-class delta decode w/ target stds, clip, rescale, multiclass
    NMS — vs our ``rcnn_decode_nms`` on identical logits/proposals."""
    import sys as _sys
    import os.path as _osp

    _sys.path.insert(0, _osp.dirname(__file__))
    from test_torch_oracle_postproc import _load_reference_postproc

    nms_impl = _load_reference_postproc().multiclass_nms

    rng = np.random.RandomState(6)
    B, P = 2, 30
    head = ref_mod.BBoxHead(
        with_avg_pool=False, roi_feat_size=7, in_channels=8,
        num_classes=NUM_CLASSES, reg_class_agnostic=False,
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0] * 4,
                        target_stds=[0.1, 0.1, 0.2, 0.2]))
    type(head).get_bboxes.__globals__["multiclass_nms"] = nms_impl
    cls_logits = rng.randn(B * P, NUM_CLASSES + 1).astype(np.float32)
    reg = (rng.randn(B * P, NUM_CLASSES * 4) * 0.8).astype(np.float32)
    x1 = rng.uniform(0, 50, (B, P))
    y1 = rng.uniform(0, 40, (B, P))
    proposals = np.stack(
        [x1, y1, x1 + rng.uniform(8, 30, (B, P)),
         y1 + rng.uniform(8, 25, (B, P))], -1).astype(np.float32)
    sf = np.asarray([1.5, 1.25, 1.5, 1.25], np.float32)
    cfg = _Cfg(score_thr=0.2, nms=_Cfg(type="nms", iou_threshold=0.5),
               max_per_img=12)
    t = torch.from_numpy
    refs = []
    with torch.no_grad():
        for bi in range(B):
            rois = torch.cat([torch.full((P, 1), bi),
                              t(proposals[bi])], dim=1)
            rd, rl = head.get_bboxes(
                rois, t(cls_logits[bi * P:(bi + 1) * P]),
                t(reg[bi * P:(bi + 1) * P]), (*IMG_HW, 3), sf,
                rescale=True, cfg=cfg)
            refs.append((rd.numpy(), rl.numpy()))

    import jax.numpy as jnp
    from dsl_tpu.models.roi_heads.standard_roi_head import (
        Shared2FCBBoxHead, rcnn_decode_nms)

    our_head = Shared2FCBBoxHead(num_classes=NUM_CLASSES,
                                 target_stds=(0.1, 0.1, 0.2, 0.2))
    dets, labels, valid = rcnn_decode_nms(
        our_head, jnp.asarray(cls_logits), jnp.asarray(reg),
        jnp.asarray(proposals), jnp.ones((B, P), bool),
        img_shapes=jnp.asarray([[IMG_HW[0], IMG_HW[1]]] * B, jnp.float32),
        scale_factors=jnp.asarray(np.tile(sf, (B, 1))),
        score_thr=0.2, iou_threshold=0.5, max_per_img=12)
    for bi in range(B):
        rd, rl = refs[bi]
        m = np.asarray(valid[bi])
        od = np.asarray(dets[bi])[m]
        ol = np.asarray(labels[bi])[m]
        assert len(od) == len(rd), (bi, len(od), len(rd))
        oo = np.argsort(-od[:, 4], kind="mergesort")
        ro = np.argsort(-rd[:, 4], kind="mergesort")
        np.testing.assert_allclose(od[oo], rd[ro], rtol=1e-4, atol=1e-3,
                                   err_msg=f"img {bi}")
        np.testing.assert_array_equal(ol[oo], rl[ro])
