"""Test APIs: dataset-wide inference producing eval-ready results.

Parity with ``/root/reference/mmdet/apis/test.py:16-190``
(single_gpu_test / multi_gpu_test): iterate the dataset through the test
pipeline, run the jitted predict step in fixed-size batches, return per-image
``(dets (N, 5), labels (N,))`` numpy results for ``dataset.evaluate``. The
reference's tmpdir/GPU gather is unnecessary — a single process drives the
chip(s); multi-chip eval shards the batch over the mesh like training.
"""

from __future__ import annotations

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from dsl_tpu.data.formatting import DEFAULT_CANVAS
from dsl_tpu.models.detectors.single_stage import detector_predict


def _resize_test_image(dataset, idx, img_scale=(1333, 800),
                       flip: bool = False):
    """Decode + keep-ratio resize (no padding — the canvas is chosen per
    batch from the resized orientations). ``flip`` mirrors horizontally
    (TTA flip pass)."""
    import os.path as osp

    info = dataset.data_infos[idx]
    path = osp.join(dataset.img_prefix, info["filename"]) \
        if dataset.img_prefix else info["filename"]
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    if flip:
        img = img[:, ::-1]
    h, w = img.shape[:2]
    long_s, short_s = max(img_scale), min(img_scale)
    factor = min(long_s / max(h, w), short_s / min(h, w))
    nw, nh = int(w * factor + 0.5), int(h * factor + 0.5)
    out = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    sf = np.asarray([nw / w, nh / h, nw / w, nh / h], np.float32)
    return out, np.asarray([nh, nw], np.float32), sf


def normalize_pad(img_u8: np.ndarray, canvas_hw, img_norm=None) -> np.ndarray:
    """Fused normalize + zero-pad into a canvas (native op w/ fallback)."""
    norm = img_norm or dict(mean=(123.675, 116.28, 103.53),
                            std=(58.395, 57.12, 57.375), to_rgb=True)
    ch, cw = canvas_hw
    from dsl_tpu.native import native_normalize_pad

    canvas = native_normalize_pad(
        np.clip(img_u8, 0, 255).astype(np.uint8),
        np.asarray(norm["mean"], np.float32),
        np.asarray(norm["std"], np.float32), norm.get("to_rgb", True),
        (ch, cw))
    if canvas is None:  # no native toolchain: numpy fallback
        outf = img_u8.astype(np.float32)
        if norm.get("to_rgb", True):
            outf = outf[..., ::-1]
        outf = (outf - np.asarray(norm["mean"], np.float32)) / np.asarray(
            norm["std"], np.float32)
        canvas = np.zeros((ch, cw, 3), np.float32)
        nh, nw = img_u8.shape[:2]
        canvas[:min(nh, ch), :min(nw, cw)] = outf[:ch, :cw]
    return canvas


def single_device_test(detector, variables, dataset, test_cfg=None,
                       canvas_hw=DEFAULT_CANVAS, batch_size: int = 8,
                       img_scale=(1333, 800), img_norm=None,
                       return_results: bool = False, evaluate: bool = True,
                       flip: bool = False, boxes_only: bool = False):
    """Run inference over a dataset; returns eval metrics (and/or results).

    For Mask R-CNN the per-image results are ``(dets, labels, masks)`` with
    full-resolution binary masks pasted on host (reference
    ``simple_test_mask``); ``dataset.evaluate(metric=["bbox", "segm"])``
    consumes them."""
    det_name = type(detector).__name__
    with_masks = det_name in ("MaskRCNN", "MaskScoringRCNN", "YOLACT") \
        and not boxes_only

    @jax.jit
    def predict(variables, images, shapes, sfs):
        if det_name == "YOLACT":
            from dsl_tpu.models.dense_heads.yolact_head import \
                yolact_full_predict

            return yolact_full_predict(detector, variables, images,
                                       img_shapes=shapes, scale_factors=sfs,
                                       test_cfg=test_cfg)
        if with_masks:
            from dsl_tpu.models.detectors.two_stage import mask_rcnn_predict

            return mask_rcnn_predict(detector, variables, images,
                                     img_shapes=shapes, scale_factors=sfs,
                                     test_cfg=test_cfg)
        return detector_predict(detector, variables, images,
                                img_shapes=shapes, scale_factors=sfs,
                                test_cfg=test_cfg)

    from dsl_tpu.data.formatting import select_canvas

    n = len(dataset)
    results = []
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        preps = [_resize_test_image(dataset, i, img_scale, flip=flip)
                 for i in idxs]
        canvas = select_canvas([p[0].shape[:2] for p in preps], canvas_hw)
        imgs = np.stack([normalize_pad(p[0], canvas, img_norm)
                         for p in preps])
        shapes = np.stack([p[1] for p in preps])
        sfs = np.stack([p[2] for p in preps])
        if len(idxs) < batch_size:
            pad = batch_size - len(idxs)
            imgs = np.concatenate([imgs, np.zeros_like(imgs[:1]).repeat(
                pad, axis=0)])
            shapes = np.concatenate([shapes, shapes[:1].repeat(pad, axis=0)])
            sfs = np.concatenate([sfs, sfs[:1].repeat(pad, axis=0)])
        outs = predict(variables, jnp.asarray(imgs),
                       jnp.asarray(shapes), jnp.asarray(sfs))
        if with_masks:
            dets, labels, valid, mask_probs = (np.asarray(o) for o in outs)
        else:
            dets, labels, valid = (np.asarray(o) for o in outs)
        for bi in range(len(idxs)):
            m = valid[bi]
            if with_masks:
                from dsl_tpu.models.roi_heads.mask_head import paste_masks

                info = dataset.data_infos[idxs[bi]]
                masks = paste_masks(mask_probs[bi][m], dets[bi][m],
                                    info["height"], info["width"])
                results.append((dets[bi][m], labels[bi][m], masks))
            else:
                results.append((dets[bi][m], labels[bi][m]))
    if not evaluate:
        return results
    metrics = dataset.evaluate(
        results, metric=["bbox", "segm"] if with_masks else "bbox",
        verbose=False)
    if return_results:
        return metrics, results
    return metrics


def _multiclass_nms_np(boxes, scores, factors, score_thr, iou_threshold,
                       max_per_img):
    """Host multiclass NMS with mmdet ``multiclass_nms`` semantics
    (bbox_nms.py:7-96): candidates = raw score > thr; factors multiply
    AFTER thresholding; class-offset greedy NMS; top max_per_img.

    boxes (P, 4); scores (P, C); factors (P,) or None."""
    from dsl_tpu.train.label_store import numpy_nms

    p, c = scores.shape
    cand = scores > score_thr
    ranked = scores * factors[:, None] if factors is not None else scores
    pi, ci = np.nonzero(cand)
    if len(pi) == 0:
        return (np.zeros((0, 5), np.float32), np.zeros((0,), np.int64))
    bx = boxes[pi]
    sc = ranked[pi, ci].astype(np.float32)
    off = (bx.max() + 1.0) * ci[:, None].astype(np.float32)
    keep = numpy_nms(bx + off, sc, iou_threshold)
    keep = keep[:max_per_img]
    dets = np.concatenate([bx[keep], sc[keep, None]], axis=1)
    return dets, ci[keep].astype(np.int64)


def tta_test_dense(detector, variables, dataset, test_cfg=None,
                   img_scales=((1333, 800),), flip: bool = True,
                   canvas_hw=DEFAULT_CANVAS, batch_size: int = 8,
                   img_norm=None, evaluate: bool = True):
    """Reference-EXACT dense-head TTA (``dense_test_mixins.aug_test_bboxes``
    + ``merge_aug_bboxes``): each aug contributes its RAW nms_pre candidates
    (``get_bboxes(..., with_nms=False)``) mapped back to original coords;
    all candidates are concatenated and a SINGLE multiclass NMS with the
    merged centerness factors produces the final detections — unlike
    :func:`tta_test`, which NMSes per aug first (a cheaper approximation).

    FCOS-family heads (with_nms=False support)."""
    import jax as _jax

    from dsl_tpu.models.dense_heads.fcos_head import fcos_get_bboxes
    from dsl_tpu.data.formatting import select_canvas
    from dsl_tpu.utils.precision import outputs_to_f32

    head = detector.bbox_head
    assert type(head).__name__ in ("FCOSHead", "NASFCOSHead"), \
        "tta_test_dense: FCOS-family heads only"
    tc = dict(test_cfg or detector.test_cfg or {})
    nms_cfg = dict(tc.get("nms", {}) or {})
    score_thr = tc.get("score_thr", 0.05)
    iou_threshold = nms_cfg.get("iou_threshold", 0.6)
    max_per_img = tc.get("max_per_img", 100)
    nms_pre = tc.get("nms_pre", 1000)

    @_jax.jit
    def raw(variables, images, shapes):
        outputs = outputs_to_f32(
            detector.apply(variables, images, training=False))
        cls, reg, cent = outputs
        return fcos_get_bboxes(head, cls, reg, cent, img_shapes=shapes,
                               scale_factors=None, nms_pre=nms_pre,
                               with_nms=False)

    n = len(dataset)
    cand = [[] for _ in range(n)]        # per image: (boxes, scores, cent)
    for scale in img_scales:
        for flipped in ((False, True) if flip else (False,)):
            for start in range(0, n, batch_size):
                idxs = list(range(start, min(start + batch_size, n)))
                preps = [_resize_test_image(dataset, i, scale, flip=flipped)
                         for i in idxs]
                canvas = select_canvas([p[0].shape[:2] for p in preps],
                                       canvas_hw)
                imgs = np.stack([normalize_pad(p[0], canvas, img_norm)
                                 for p in preps])
                shapes = np.stack([p[1] for p in preps])
                b = len(idxs)
                if b < batch_size:
                    pad = batch_size - b
                    imgs = np.concatenate(
                        [imgs, np.zeros_like(imgs[:1]).repeat(pad, 0)])
                    shapes = np.concatenate(
                        [shapes, shapes[:1].repeat(pad, 0)])
                boxes, scores, cent = (np.asarray(o) for o in raw(
                    variables, jnp.asarray(imgs), jnp.asarray(shapes)))
                for bi in range(b):
                    bx = boxes[bi].copy()
                    if flipped:
                        # bbox_mapping_back: flip in the INPUT frame first
                        iw = preps[bi][1][1]
                        x1 = iw - bx[:, 2]
                        x2 = iw - bx[:, 0]
                        bx[:, 0], bx[:, 2] = x1, x2
                    bx /= preps[bi][2]        # then rescale to original
                    cand[idxs[bi]].append((bx, scores[bi], cent[bi]))

    merged = []
    for i in range(n):
        bx = np.concatenate([c[0] for c in cand[i]])
        sc = np.concatenate([c[1] for c in cand[i]])
        ct = np.concatenate([c[2] for c in cand[i]])
        merged.append(_multiclass_nms_np(bx, sc, ct, score_thr,
                                         iou_threshold, max_per_img))
    if not evaluate:
        return merged
    return dataset.evaluate(merged, metric="bbox", verbose=False)


def merge_aug_detections(per_aug, iou_threshold: float = 0.5,
                         max_per_img: int = 100):
    """Merge one image's detections across TTA augmentations (reference
    ``dense_test_mixins.aug_test_bboxes`` / ``merge_aug_bboxes``): all
    results are already mapped to original-image coordinates, so the merge
    is a concat + per-class NMS + top-k."""
    from dsl_tpu.train.label_store import numpy_nms

    # results may be (dets, labels) or (dets, labels, masks)
    dets = np.concatenate([r[0] for r in per_aug], axis=0)
    labels = np.concatenate([r[1] for r in per_aug], axis=0)
    if len(dets) == 0:
        return dets, labels
    keep_all = []
    for c in np.unique(labels):
        idx = np.where(labels == c)[0]
        kept = numpy_nms(dets[idx, :4], dets[idx, 4], iou_threshold)
        keep_all.append(idx[kept])
    keep = np.concatenate(keep_all)
    order = keep[np.argsort(-dets[keep, 4])][:max_per_img]
    return dets[order], labels[order]


def tta_test(detector, variables, dataset, test_cfg=None,
             img_scales=((1333, 800),), flip: bool = True,
             canvas_hw=DEFAULT_CANVAS, batch_size: int = 8, img_norm=None,
             iou_threshold: float = 0.5, max_per_img: int = 100,
             evaluate: bool = True):
    """Multi-scale + flip test-time augmentation (the reference's
    ``MultiScaleFlipAug`` + ``aug_test`` path): one pass per (scale, flip),
    each producing original-frame detections, merged per image.

    Horizontal flip runs on the flipped image and mirrors the boxes back
    with the original image width."""
    aug_results = []
    for scale in img_scales:
        for flipped in ((False, True) if flip else (False,)):
            res = single_device_test(
                detector, variables, dataset, test_cfg=test_cfg,
                canvas_hw=canvas_hw, batch_size=batch_size,
                img_scale=scale, img_norm=img_norm,
                evaluate=False, flip=flipped, boxes_only=True)
            if flipped:
                unflipped = []
                for i, r in enumerate(res):
                    dets, labels = r[0].copy(), r[1]
                    w = dataset.data_infos[i]["width"]
                    x1 = w - dets[:, 2]
                    x2 = w - dets[:, 0]
                    dets[:, 0], dets[:, 2] = x1, x2
                    unflipped.append((dets, labels))
                res = unflipped
            aug_results.append(res)

    merged = [merge_aug_detections([aug[i] for aug in aug_results],
                                   iou_threshold=iou_threshold,
                                   max_per_img=max_per_img)
              for i in range(len(dataset))]
    if not evaluate:
        return merged
    return dataset.evaluate(merged, metric="bbox", verbose=False)


def tta_test_masks(detector, variables, dataset, merged,
                   img_scales=((1333, 800),), flip: bool = True,
                   canvas_hw=DEFAULT_CANVAS, batch_size: int = 4,
                   img_norm=None, max_per_img: int = 100):
    """Mask TTA (reference ``merge_aug_masks`` /
    ``mask_test_mixins.aug_test_mask``): re-run the mask head per
    (scale, flip) at the SAME merged boxes (original coords), unflip the
    28x28 probabilities, average across augs, then paste at original size.

    ``merged``: per-image (dets, labels) from :func:`tta_test`
    (``evaluate=False``). Returns per-image (dets, labels, masks)."""
    import jax

    from dsl_tpu.models.detectors.two_stage import mask_logits_for_boxes
    from dsl_tpu.models.roi_heads.mask_head import paste_masks

    mh = detector.mask_head
    n_img = len(dataset)
    nmax = max_per_img
    # pad merged boxes/labels to a fixed capacity for static shapes
    boxes0 = np.zeros((n_img, nmax, 4), np.float32)
    labels0 = np.zeros((n_img, nmax), np.int64)
    valid0 = np.zeros((n_img, nmax), bool)
    for i, (d, l) in enumerate(merged):
        m = min(len(d), nmax)
        boxes0[i, :m] = d[:m, :4]
        labels0[i, :m] = l[:m]
        valid0[i, :m] = True

    @jax.jit
    def mask_probs(variables, images, boxes_in, valid, cls):
        feats, _ = detector.apply(variables, images, training=False)
        logits = mask_logits_for_boxes(detector, variables, feats,
                                       boxes_in, valid)
        c = jnp.clip(cls.reshape(-1), 0, mh.num_classes - 1)
        probs = jax.nn.sigmoid(jnp.take_along_axis(
            logits, c[:, None, None, None].astype(jnp.int32),
            axis=-1)[..., 0])
        s = logits.shape[1]
        return probs.reshape(images.shape[0], -1, s, s)

    from dsl_tpu.data.formatting import select_canvas

    acc = [None] * n_img
    n_aug = 0
    for scale in img_scales:
        for flipped in ((False, True) if flip else (False,)):
            n_aug += 1
            for start in range(0, n_img, batch_size):
                idxs = list(range(start, min(start + batch_size, n_img)))
                preps = [_resize_test_image(dataset, i, scale, flip=flipped)
                         for i in idxs]
                canvas = select_canvas([p[0].shape[:2] for p in preps],
                                       canvas_hw)
                imgs = np.stack([normalize_pad(p[0], canvas, img_norm)
                                 for p in preps])
                sfs = np.stack([p[2] for p in preps])      # (b, 4)
                b = len(idxs)
                bx = boxes0[idxs] * sfs[:, None, :]        # input frame
                if flipped:
                    ws = np.asarray([preps[j][1][1] for j in range(b)])
                    x1 = ws[:, None] - bx[:, :, 2]
                    x2 = ws[:, None] - bx[:, :, 0]
                    bx[:, :, 0], bx[:, :, 2] = x1, x2
                if b < batch_size:
                    pad = batch_size - b
                    imgs = np.concatenate(
                        [imgs, np.zeros_like(imgs[:1]).repeat(pad, 0)])
                    bx = np.concatenate(
                        [bx, np.zeros_like(bx[:1]).repeat(pad, 0)])
                probs = np.asarray(mask_probs(
                    variables, jnp.asarray(imgs), jnp.asarray(bx),
                    jnp.asarray(np.concatenate(
                        [valid0[idxs],
                         np.zeros((batch_size - b, nmax), bool)])
                        if b < batch_size else valid0[idxs]),
                    jnp.asarray(np.concatenate(
                        [labels0[idxs],
                         np.zeros((batch_size - b, nmax), np.int64)])
                        if b < batch_size else labels0[idxs])))
                if flipped:
                    probs = probs[:, :, :, ::-1]
                for j, i in enumerate(idxs):
                    acc[i] = probs[j] if acc[i] is None else acc[i] + probs[j]

    results = []
    for i, (d, l) in enumerate(merged):
        info = dataset.data_infos[i]
        m = min(len(d), nmax)
        avg = acc[i][:m] / max(n_aug, 1)
        masks = paste_masks(avg, d[:m, :4], info["height"], info["width"])
        results.append((d[:m], l[:m], masks))
    return results
