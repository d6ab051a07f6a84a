"""Torch oracles for the MASK tier: the reference's own ``mask_target``
(``/root/reference/mmdet/core/mask/mask_target.py`` + BitmapMasks.
crop_and_resize), ``FCNMaskHead``'s mask BCE (``cross_entropy_loss.py
mask_cross_entropy``), ``MaskIoUHead.get_targets/loss`` (area-ratio scaled
IoU targets, ``maskiou_head.py:87-170``), ``MaskPointHead.get_targets/loss``
(PointRend, ``mask_point_head.py:106-190``) and the ``_do_paste_mask``
grid-sample paste (``fcn_mask_head.py:343-406``) — all executed on CPU with
mmcv stubbed (the mmcv ``roi_align``/``point_sample`` ops are faithful
pure-torch ports of their public kernels, self-checked against
``F.grid_sample`` below).

What each oracle pins on our side:
- ``core/masks.py mask_target`` — EXACT (same aligned-avg RoIAlign math).
- ``mask_head.py mask_targets_from_crops`` — the TPU crop-resample layout,
  tight agreement bound vs the reference's full-res targets.
- ``mask_head.py mask_head_loss`` — EXACT.
- ``maskiou_head.py mask_iou_target/mask_iou_loss`` — loss EXACT given
  identical targets; targets within a resample tolerance (the in-proposal
  area is integrated from the 112x112 crop instead of the full-res mask).
- ``point_rend.py point_targets_from_crops`` + the point BCE — loss EXACT;
  targets within a bilinear-resample tolerance.
- ``mask_head.py paste_masks`` — per-instance IoU vs the reference paste.

Skipped automatically when /root/reference or torch is unavailable.
"""

import os.path as osp
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/mmdet"
REF_MT = osp.join(REF_ROOT, "core/mask/mask_target.py")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not osp.exists(REF_MT),
                                reason="reference tree not available")


# ---------------------------------------------------------------------------
# Pure-torch ports of the two mmcv ops the reference mask code calls.
# ---------------------------------------------------------------------------

def _pt_roi_align(feats, rois, out_size, spatial_scale=1.0,
                  sampling_ratio=0, pool_mode="avg", aligned=True):
    """mmcv ``roi_align`` (the CUDA kernel's exact sampling rules) in torch.

    feats (N, C, H, W); rois (R, 5) = [batch_idx, x1, y1, x2, y2].
    aligned: half-pixel offset; sampling_ratio=0: ceil(roi/bin) grid;
    border rule: zero outside [-1, size], edge-clamped bilinear inside.
    """
    assert pool_mode == "avg" and aligned
    n, c, h, w = feats.shape
    oh, ow = out_size
    out = feats.new_zeros(rois.shape[0], c, oh, ow)
    for r in range(rois.shape[0]):
        bi = int(rois[r, 0])
        x1, y1, x2, y2 = [float(v) * spatial_scale for v in rois[r, 1:]]
        sx, sy = x1 - 0.5, y1 - 0.5
        rw, rh = x2 - x1, y2 - y1
        gh = int(np.ceil(rh / oh))
        gw = int(np.ceil(rw / ow))
        if gh <= 0 or gw <= 0:
            continue
        bin_h, bin_w = rh / oh, rw / ow
        ys = (sy + torch.arange(oh, dtype=torch.float64)[:, None] * bin_h
              + (torch.arange(gh, dtype=torch.float64)[None, :] + 0.5)
              * (bin_h / gh)).reshape(-1)
        xs = (sx + torch.arange(ow, dtype=torch.float64)[:, None] * bin_w
              + (torch.arange(gw, dtype=torch.float64)[None, :] + 0.5)
              * (bin_w / gw)).reshape(-1)

        def _axis(v, size):
            inside = (v >= -1.0) & (v <= size)
            vc = v.clamp(min=0.0)
            lo = vc.long().clamp(max=size - 1)
            hi = (lo + 1).clamp(max=size - 1)
            frac = torch.where(lo >= size - 1, torch.zeros_like(vc),
                               vc - lo.double())
            return inside, lo, hi, frac

        iy, ylo, yhi, fy = _axis(ys, h)
        ix, xlo, xhi, fx = _axis(xs, w)
        f = feats[bi].double()                                   # (C, H, W)
        v = ((1 - fy)[:, None] * (1 - fx)[None, :]
             * f[:, ylo][:, :, xlo]
             + (1 - fy)[:, None] * fx[None, :] * f[:, ylo][:, :, xhi]
             + fy[:, None] * (1 - fx)[None, :] * f[:, yhi][:, :, xlo]
             + fy[:, None] * fx[None, :] * f[:, yhi][:, :, xhi])
        v = v * (iy[:, None] & ix[None, :])
        v = v.reshape(c, oh, gh, ow, gw).sum(dim=(2, 4))
        out[r] = (v / max(gh * gw, 1)).float()
    return out


def _pt_point_sample(feats, points, align_corners=False, **kwargs):
    """mmcv ``point_sample``: grid_sample at denormalized ([0,1]→[-1,1])
    point coords, with the (N, P, 2)→(N, P, 1, 2) dim shuffle."""
    import torch.nn.functional as F

    add_dim = False
    if points.dim() == 3:
        add_dim = True
        points = points.unsqueeze(2)
    output = F.grid_sample(feats, 2.0 * points - 1.0,
                           align_corners=align_corners, **kwargs)
    if add_dim:
        output = output.squeeze(3)
    return output


def _pt_rel_roi_point_to_rel_img_point(rois, rel_roi_points, img,
                                       spatial_scale=1.0):
    """mmcv ``rel_roi_point_to_rel_img_point``."""
    if rois.size(1) == 5:
        rois = rois[:, 1:]
    xs = rel_roi_points[:, :, 0] * (rois[:, None, 2] - rois[:, None, 0]) \
        + rois[:, None, 0]
    ys = rel_roi_points[:, :, 1] * (rois[:, None, 3] - rois[:, None, 1]) \
        + rois[:, None, 1]
    abs_pts = torch.stack([xs, ys], dim=2)
    if isinstance(img, tuple):
        h, w = img
    else:
        h, w = img.shape[2:]
    scale = torch.tensor([w, h], dtype=torch.float32,
                         device=abs_pts.device) * spatial_scale
    return abs_pts / scale


def test_pt_roi_align_self_check_vs_grid_sample():
    """Independence check of the oracle's roi_align port: for interior rois
    smaller than the output grid (1 sample/bin), aligned RoIAlign IS
    bilinear sampling at bin centers == F.grid_sample (align_corners=False).
    """
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    feats = torch.from_numpy(rng.rand(1, 2, 40, 50).astype(np.float32))
    box = (8.3, 6.7, 8.3 + 20.0, 6.7 + 15.0)    # 20x15 roi < 28 out -> 1x1
    rois = torch.tensor([[0.0, *box]])
    ours = _pt_roi_align(feats, rois, (28, 28))
    # aligned sample centers (pixel centers at integer coords):
    # y = (y1 - 0.5) + (ph + 0.5) * bin_h; grid_sample g = (2y + 1)/H - 1
    ys = box[1] - 0.5 + (np.arange(28) + 0.5) * (box[3] - box[1]) / 28
    xs = box[0] - 0.5 + (np.arange(28) + 0.5) * (box[2] - box[0]) / 28
    gy = (2 * torch.from_numpy(ys).float() + 1) / 40 - 1
    gx = (2 * torch.from_numpy(xs).float() + 1) / 50 - 1
    grid = torch.stack(torch.meshgrid(gy, gx, indexing="ij"),
                       dim=-1)[None]             # (1, 28, 28, 2) as (y, x)
    grid = grid.flip(-1)                          # grid_sample wants (x, y)
    ref = F.grid_sample(feats, grid, align_corners=False)
    np.testing.assert_allclose(ours[0].numpy(), ref[0].numpy(),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Reference loader
# ---------------------------------------------------------------------------

def _load_reference_masks():
    import importlib.util

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

    import torch.nn as nn

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

    class ConvModule(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    class _Reg:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    # ---- mmcv stubs -------------------------------------------------------
    mmcv = _stub("mmcv")
    mmcv.jit = lambda **kw: (lambda f: f)
    # geometric image ops (BitmapMasks.shear/rotate/translate): shared with
    # our pipeline so the structures.py-level logic is what's compared
    from dsl_tpu.data.pipelines import geometric as _G

    mmcv.imshear = _G.imshear
    mmcv.imtranslate = _G.imtranslate
    mmcv.imrotate = _G.imrotate
    mmcv_cnn = _stub("mmcv.cnn")
    mmcv_cnn.Conv2d = nn.Conv2d
    mmcv_cnn.Linear = nn.Linear
    mmcv_cnn.MaxPool2d = nn.MaxPool2d
    mmcv_cnn.ConvModule = ConvModule
    mmcv_cnn.build_conv_layer = lambda cfg, *a, **k: nn.Conv2d(*a, **k)
    mmcv_cnn.build_upsample_layer = lambda cfg, *a, **k: nn.Identity()
    mmcv_runner = _stub("mmcv.runner")
    mmcv_runner.BaseModule = BaseModule
    mmcv_runner.ModuleList = nn.ModuleList
    mmcv_runner.force_fp32 = lambda **kw: (lambda f: f)
    mmcv_runner.auto_fp16 = lambda **kw: (lambda f: f)
    mmcv_ops = _stub("mmcv.ops")
    mmcv_ops.point_sample = _pt_point_sample
    mmcv_ops.rel_roi_point_to_rel_img_point = \
        _pt_rel_roi_point_to_rel_img_point
    mmcv_ops_ra = _stub("mmcv.ops.roi_align")
    mmcv_ops_ra.roi_align = _pt_roi_align
    mmcv_ops.roi_align = _pt_roi_align
    mmcv_ops_carafe = _stub("mmcv.ops.carafe")
    mmcv_ops_carafe.CARAFEPack = type("CARAFEPack", (nn.Module,), {})
    mmcv_ops.carafe = mmcv_ops_carafe
    mmcv.cnn, mmcv.runner, mmcv.ops = mmcv_cnn, mmcv_runner, mmcv_ops
    pycoco = _stub("pycocotools")
    pycoco_mask = _stub("pycocotools.mask")
    pycoco.mask = pycoco_mask

    # ---- mmdet package stubs ----------------------------------------------
    mmdet = _stub("mmdet")
    mmdet_models = _stub("mmdet.models")
    mmdet_builder = _stub("mmdet.models.builder")
    mmdet_builder.HEADS = _Reg()
    mmdet_builder.LOSSES = _Reg()
    mmdet_core = _stub("mmdet.core")
    mmdet.models, mmdet.core = mmdet_models, mmdet_core
    mmdet_models.builder = mmdet_builder
    for pkg in ("refm", "refm.models", "refm.models.losses"):
        _stub(pkg)
    refm_builder = _stub("refm.models.builder")
    refm_builder.LOSSES = _Reg()

    saved = {k: sys.modules.get(k) for k in set(new_mods)}
    sys.modules.update(new_mods)
    try:
        _load("refm.models.losses.utils",
              osp.join(REF_ROOT, "models/losses/utils.py"))
        _load("refm.models.losses.accuracy",
              osp.join(REF_ROOT, "models/losses/accuracy.py"))
        ce = _load("refm.models.losses.cross_entropy_loss",
                   osp.join(REF_ROOT, "models/losses/cross_entropy_loss.py"))
        mse = _load("refm.models.losses.mse_loss",
                    osp.join(REF_ROOT, "models/losses/mse_loss.py"))

        def build_loss(cfg):
            cfg = dict(cfg)
            t = cfg.pop("type")
            return {"CrossEntropyLoss": ce.CrossEntropyLoss,
                    "MSELoss": mse.MSELoss}[t](**cfg)

        mmdet_builder.build_loss = build_loss

        structures = _load("refm_structures",
                           osp.join(REF_ROOT, "core/mask/structures.py"))
        mt = _load("refm_mask_target", REF_MT)
        mmdet_core.mask_target = mt.mask_target
        miou = _load("refm_maskiou_head",
                     osp.join(REF_ROOT,
                              "models/roi_heads/mask_heads/maskiou_head.py"))
        mph = _load("refm_mask_point_head",
                    osp.join(REF_ROOT,
                             "models/roi_heads/mask_heads/"
                             "mask_point_head.py"))
        fmh = _load("refm_fcn_mask_head",
                    osp.join(REF_ROOT,
                             "models/roi_heads/mask_heads/"
                             "fcn_mask_head.py"))
        return types.SimpleNamespace(
            BitmapMasks=structures.BitmapMasks,
            mask_target=mt.mask_target,
            mask_cross_entropy=ce.mask_cross_entropy,
            MaskIoUHead=miou.MaskIoUHead,
            MaskPointHead=mph.MaskPointHead,
            do_paste_mask=fmh._do_paste_mask)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def ref_mod():
    return _load_reference_masks()


class _Cfg(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


# ---------------------------------------------------------------------------
# Shared synthetic data
# ---------------------------------------------------------------------------

def _blob_masks(rng, n, h, w):
    """Random blobby binary masks (filled ellipses + a rectangle)."""
    import cv2

    masks = np.zeros((n, h, w), np.uint8)
    for i in range(n):
        for _ in range(rng.randint(1, 4)):
            cx, cy = rng.randint(5, w - 5), rng.randint(5, h - 5)
            ax, ay = rng.randint(4, w // 3), rng.randint(4, h // 3)
            cv2.ellipse(masks[i], (cx, cy), (ax, ay),
                        rng.randint(0, 180), 0, 360, 1, -1)
        if rng.rand() < 0.5:
            x0, y0 = rng.randint(0, w - 8), rng.randint(0, h - 8)
            masks[i, y0:y0 + rng.randint(4, 8),
                  x0:x0 + rng.randint(4, 8)] = 1
    return masks


def _tight_boxes(masks):
    out = np.zeros((len(masks), 4), np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        out[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return out


def _rand_proposals(rng, boxes, h, w, n_per=3):
    """Jittered boxes around each GT + a couple of random ones."""
    props, gts = [], []
    for gi, b in enumerate(boxes):
        bw, bh = b[2] - b[0], b[3] - b[1]
        for _ in range(n_per):
            jit = rng.uniform(-0.35, 0.35, 4) * np.array([bw, bh, bw, bh])
            p = b + jit
            p = [min(p[0], p[2] - 2), min(p[1], p[3] - 2),
                 max(p[2], p[0] + 2), max(p[3], p[1] + 2)]
            props.append(p)
            gts.append(gi)
    props.append([-5.0, -3.0, w * 0.4, h * 0.5])       # crosses the border
    gts.append(0)
    props.append([w * 0.2, h * 0.1, w * 1.2, h * 0.9])  # exceeds right edge
    gts.append(len(boxes) - 1)
    return np.asarray(props, np.float32), np.asarray(gts, np.int64)


# ---------------------------------------------------------------------------
# 1. mask_target
# ---------------------------------------------------------------------------

def test_mask_target_matches_reference_exactly(ref_mod):
    """Host ``core/masks.py mask_target`` == the reference ``mask_target``
    (aligned avg RoIAlign on the float clipped proposal, binarize >= 0.5)."""
    from dsl_tpu.core.masks import BitmapMasks as OurBM
    from dsl_tpu.core.masks import mask_target as our_mt

    rng = np.random.RandomState(7)
    h, w = 57, 83
    masks = _blob_masks(rng, 4, h, w)
    boxes = _tight_boxes(masks)
    props, gts = _rand_proposals(rng, boxes, h, w)

    ref = ref_mod.mask_target(
        [torch.from_numpy(props)], [torch.from_numpy(gts)],
        [ref_mod.BitmapMasks(masks, h, w)], _Cfg(mask_size=28)).numpy()
    ours = our_mt(OurBM(masks, h, w), props, gts, mask_size=28)
    # identical math modulo float assoc; allow flips only AT the 0.5 tie
    disagree = float(np.abs(ref - ours).mean())
    assert disagree < 1e-3, f"mask_target disagreement {disagree}"


def test_device_mask_targets_close_to_reference(ref_mod):
    """Device ``mask_targets_from_crops`` (per-GT 112x112 crop resample) vs
    the reference's full-res targets: tight pixel agreement."""
    import jax.numpy as jnp
    from dsl_tpu.models.roi_heads.mask_head import (
        GT_MASK_CROP_SIZE, gt_mask_crop, mask_targets_from_crops)

    rng = np.random.RandomState(11)
    h, w = 64, 96
    masks = _blob_masks(rng, 3, h, w)
    boxes = _tight_boxes(masks)
    props, gts = _rand_proposals(rng, boxes, h, w)

    ref = ref_mod.mask_target(
        [torch.from_numpy(props)], [torch.from_numpy(gts)],
        [ref_mod.BitmapMasks(masks, h, w)], _Cfg(mask_size=28)).numpy()

    m = GT_MASK_CROP_SIZE
    k = len(masks)
    crops = np.zeros((1, k, m, m), np.float32)
    for i in range(k):
        crops[0, i] = (gt_mask_crop(masks[i], boxes[i], m) >= 0.5)
    dev = np.asarray(mask_targets_from_crops(
        jnp.asarray(crops), jnp.asarray(boxes[None]), jnp.asarray(props),
        jnp.zeros(len(props), jnp.int32), jnp.asarray(gts, jnp.int32),
        mask_size=28))
    agree = (dev == ref).mean()
    assert agree > 0.97, f"device mask-target agreement {agree}"
    # alignment check: any 2px shift of the device targets must be worse
    for dy, dx in ((0, 2), (2, 0), (0, -2), (-2, 0)):
        shifted = np.roll(dev, (dy, dx), axis=(1, 2))
        assert (shifted == ref).mean() < agree


# ---------------------------------------------------------------------------
# 2. FCN mask loss
# ---------------------------------------------------------------------------

def test_fcn_mask_loss_matches_reference(ref_mod):
    """``mask_head_loss`` == ``mask_cross_entropy`` (FCNMaskHead.loss with
    class-specific slicing, mean over all positive-roi pixels)."""
    import jax.numpy as jnp
    from dsl_tpu.models.roi_heads.mask_head import mask_head_loss

    rng = np.random.RandomState(3)
    n, c, s = 9, 5, 28
    logits = rng.randn(n, c, s, s).astype(np.float32)
    targets = (rng.rand(n, s, s) > 0.6).astype(np.float32)
    labels = rng.randint(0, c, n).astype(np.int64)

    ref = float(ref_mod.mask_cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(targets),
        torch.from_numpy(labels)))
    ours = float(mask_head_loss(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(targets),
        jnp.asarray(labels), jnp.ones(n, jnp.float32), num_classes=c))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# 3. MaskIoU head
# ---------------------------------------------------------------------------

def test_mask_iou_targets_and_loss_match_reference(ref_mod):
    """``mask_iou_target`` (area-ratio form) vs the reference
    ``MaskIoUHead.get_targets`` and EXACT ``loss`` semantics (MSE x0.5 over
    rois with target > 0)."""
    import jax.numpy as jnp
    from dsl_tpu.models.roi_heads.mask_head import gt_mask_crop
    from dsl_tpu.models.roi_heads.mask_head import GT_MASK_CROP_SIZE
    from dsl_tpu.models.roi_heads.maskiou_head import (mask_iou_loss,
                                                       mask_iou_target)

    rng = np.random.RandomState(5)
    h, w = 72, 104
    masks = _blob_masks(rng, 3, h, w)
    boxes = _tight_boxes(masks)
    props, gts = _rand_proposals(rng, boxes, h, w)
    n = len(props)

    ref_bm = ref_mod.BitmapMasks(masks, h, w)
    mask_targets = ref_mod.mask_target(
        [torch.from_numpy(props)], [torch.from_numpy(gts)],
        [ref_bm], _Cfg(mask_size=28))
    mask_pred = torch.from_numpy(rng.rand(n, 28, 28).astype(np.float32))

    head = ref_mod.MaskIoUHead(num_classes=4)
    sr = types.SimpleNamespace(pos_bboxes=torch.from_numpy(props),
                               pos_assigned_gt_inds=torch.from_numpy(gts))
    ref_t = head.get_targets([sr], [ref_bm], mask_pred, mask_targets,
                             _Cfg(mask_thr_binary=0.5)).numpy()

    m = GT_MASK_CROP_SIZE
    crops = np.zeros((len(masks), m, m), np.float32)
    for i in range(len(masks)):
        crops[i] = (gt_mask_crop(masks[i], boxes[i], m) >= 0.5)
    ours_t = np.asarray(mask_iou_target(
        jnp.asarray(mask_pred.numpy()), jnp.asarray(mask_targets.numpy()),
        jnp.ones(n, jnp.float32),
        gt_full_areas=jnp.asarray(masks.sum((1, 2)).astype(np.float32))[
            jnp.asarray(gts)],
        crops=jnp.asarray(crops)[jnp.asarray(gts)],
        gt_boxes=jnp.asarray(boxes)[jnp.asarray(gts)],
        rois=jnp.asarray(props),
        img_shapes=jnp.broadcast_to(
            jnp.asarray([h, w], jnp.float32), (n, 2))))
    np.testing.assert_allclose(ours_t, ref_t, atol=0.04,
                               err_msg="mask-iou targets")

    # loss: EXACT given identical targets (incl. a zero-target roi)
    ref_t_torch = torch.from_numpy(ref_t)
    ref_t_torch[1] = 0.0
    iou_pred = rng.rand(n, 4).astype(np.float32)
    labels = rng.randint(0, 4, n).astype(np.int64)
    pos = ref_t_torch > 0
    ref_loss = float(head.loss(
        torch.from_numpy(iou_pred)[torch.arange(n), labels],
        ref_t_torch)["loss_mask_iou"])
    ours_loss = float(mask_iou_loss(
        jnp.asarray(iou_pred), jnp.asarray(labels),
        jnp.asarray(ref_t_torch.numpy()), jnp.ones(n, jnp.float32),
        num_classes=4))
    assert pos.sum() > 0
    np.testing.assert_allclose(ours_loss, ref_loss, rtol=2e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# 4. PointRend point head
# ---------------------------------------------------------------------------

def test_mask_point_targets_and_loss_match_reference(ref_mod):
    """``point_targets_from_crops`` vs ``MaskPointHead.get_targets`` at the
    same roi-relative points, and EXACT point BCE."""
    import jax.numpy as jnp
    from dsl_tpu.models.roi_heads.mask_head import (GT_MASK_CROP_SIZE,
                                                    gt_mask_crop)
    from dsl_tpu.models.roi_heads.point_rend import point_targets_from_crops

    rng = np.random.RandomState(13)
    h, w = 80, 112
    masks = _blob_masks(rng, 3, h, w)
    boxes = _tight_boxes(masks)
    props, gts = _rand_proposals(rng, boxes, h, w, n_per=2)
    n, p = len(props), 49
    rel = rng.rand(n, p, 2).astype(np.float32)

    head = ref_mod.MaskPointHead(num_classes=4)
    rois5 = torch.cat([torch.zeros(n, 1), torch.from_numpy(props)], dim=1)
    sr = types.SimpleNamespace(pos_assigned_gt_inds=torch.from_numpy(gts))
    ref_t = head.get_targets(rois5, torch.from_numpy(rel), [sr],
                             [ref_mod.BitmapMasks(masks, h, w)],
                             _Cfg(num_points=p)).numpy()

    m = GT_MASK_CROP_SIZE
    crops = np.zeros((len(masks), m, m), np.float32)
    for i in range(len(masks)):
        crops[i] = (gt_mask_crop(masks[i], boxes[i], m) >= 0.5)
    ours_t = np.asarray(point_targets_from_crops(
        jnp.asarray(crops)[jnp.asarray(gts)],
        jnp.asarray(boxes)[jnp.asarray(gts)],
        jnp.asarray(props), jnp.asarray(rel)))
    # bilinear-from-crop vs grid_sample-from-full-res: tight mean agreement
    assert np.abs(ours_t - ref_t).mean() < 0.06
    assert ((ours_t > 0.5) == (ref_t > 0.5)).mean() > 0.93

    # point loss: EXACT given identical targets (mask_cross_entropy path)
    logits = rng.randn(n, 4, p).astype(np.float32)
    labels = rng.randint(0, 4, n).astype(np.int64)
    ref_loss = float(head.loss(torch.from_numpy(logits),
                               torch.from_numpy(ref_t),
                               torch.from_numpy(labels))["loss_point"])
    sel = logits[np.arange(n), labels]                     # (N, P)
    sj = jnp.asarray(sel)
    tj = jnp.asarray(ref_t)
    bce = (jnp.maximum(sj, 0) - sj * tj
           + jnp.log1p(jnp.exp(-jnp.abs(sj))))
    ours_loss = float(bce.mean())   # all-positive: our sum/(pos*P) == mean
    np.testing.assert_allclose(ours_loss, ref_loss, rtol=2e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# 5. Mask paste
# ---------------------------------------------------------------------------

def test_paste_masks_close_to_reference(ref_mod):
    """``paste_masks`` (cv2 resize into the box) vs the reference
    ``_do_paste_mask`` (grid_sample over the full image): high per-instance
    IoU after the 0.5 threshold."""
    from dsl_tpu.models.roi_heads.mask_head import paste_masks

    rng = np.random.RandomState(17)
    n, s, ih, iw = 5, 28, 120, 160
    # smooth blobby probability masks
    import cv2

    probs = np.zeros((n, s, s), np.float32)
    for i in range(n):
        small = _blob_masks(rng, 1, s, s)[0].astype(np.float32)
        probs[i] = cv2.GaussianBlur(small, (5, 5), 1.5)
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        x1 = rng.uniform(0, iw - 60)
        y1 = rng.uniform(0, ih - 60)
        boxes[i] = [x1, y1, x1 + rng.uniform(40, 55), y1 + rng.uniform(40, 55)]

    ref_paste, _ = ref_mod.do_paste_mask(
        torch.from_numpy(probs)[:, None], torch.from_numpy(boxes),
        ih, iw, skip_empty=False)
    ref_bin = (ref_paste.numpy() >= 0.5).astype(np.uint8)
    ours = paste_masks(probs, boxes, ih, iw, thr=0.5)
    for i in range(n):
        inter = (ours[i] & ref_bin[i]).sum()
        union = (ours[i] | ref_bin[i]).sum()
        assert union > 0
        iou = inter / union
        assert iou > 0.88, f"paste IoU[{i}] = {iou}"
