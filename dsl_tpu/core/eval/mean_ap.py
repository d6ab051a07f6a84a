"""VOC-style mAP / recall evaluation, pure numpy.

Parity with ``/root/reference/mmdet/core/evaluation/mean_ap.py:1-469``
(``eval_map``) and ``recall.py``: per-class greedy IoU matching against
GT with difficult/ignore handling, AP by the 'area' (every-point) or
'11points' interpolation, scale-range filtering.
"""

from __future__ import annotations

import numpy as np


def _iou_xyxy(dts: np.ndarray, gts: np.ndarray) -> np.ndarray:
    if len(dts) == 0 or len(gts) == 0:
        return np.zeros((len(dts), len(gts)))
    ix1 = np.maximum(dts[:, None, 0], gts[None, :, 0])
    iy1 = np.maximum(dts[:, None, 1], gts[None, :, 1])
    ix2 = np.minimum(dts[:, None, 2], gts[None, :, 2])
    iy2 = np.minimum(dts[:, None, 3], gts[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    a1 = ((dts[:, 2] - dts[:, 0]) * (dts[:, 3] - dts[:, 1]))[:, None]
    a2 = ((gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1]))[None, :]
    return inter / np.maximum(a1 + a2 - inter, 1e-10)


def average_precision(recalls: np.ndarray, precisions: np.ndarray,
                      mode: str = "area") -> float:
    if mode == "area":
        mrec = np.concatenate([[0.0], recalls, [1.0]])
        mpre = np.concatenate([[0.0], precisions, [0.0]])
        for i in range(len(mpre) - 2, -1, -1):
            mpre[i] = max(mpre[i], mpre[i + 1])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))
    if mode == "11points":
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            prec = precisions[recalls >= t]
            ap += (prec.max() if prec.size else 0.0) / 11.0
        return float(ap)
    raise ValueError(mode)


def _tpfp_single(det: np.ndarray, gt: np.ndarray, gt_ignore: np.ndarray,
                 iou_thr: float):
    """Greedy match one image's class detections. Returns (tp, fp) arrays."""
    nd = len(det)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    if len(gt) == 0 and len(gt_ignore) == 0:
        fp[:] = 1
        return tp, fp
    ious = _iou_xyxy(det[:, :4], gt) if len(gt) else np.zeros((nd, 0))
    ious_ig = _iou_xyxy(det[:, :4], gt_ignore) if len(gt_ignore) else \
        np.zeros((nd, 0))
    covered = np.zeros(len(gt), bool)
    order = np.argsort(-det[:, 4], kind="mergesort")
    for i in order:
        # VOC protocol (mmdet tpfp_default): match the max-IoU GT; a second
        # detection on an already-covered GT is a FP.
        if ious.shape[1] and ious[i].max() >= iou_thr:
            j = int(np.argmax(ious[i]))
            if not covered[j]:
                covered[j] = True
                tp[i] = 1
            else:
                fp[i] = 1
            continue
        # matched an ignore region: neither tp nor fp
        if ious_ig.shape[1] and ious_ig[i].max() >= iou_thr:
            continue
        fp[i] = 1
    return tp, fp


def eval_map(det_results: list, annotations: list, iou_thr: float = 0.5,
             mode: str = "area", verbose: bool = False):
    """Compute VOC mAP.

    Args:
      det_results: per image, list of C arrays (n_i, 5) [x1,y1,x2,y2,score].
      annotations: per image dicts with ``bboxes`` (n, 4), ``labels`` (n,),
        optional ``bboxes_ignore``/``labels_ignore``.

    Returns (mAP, per-class results list).
    """
    num_classes = len(det_results[0])
    eval_results = []
    for c in range(num_classes):
        tps, fps, scores = [], [], []
        num_gts = 0
        for dets, ann in zip(det_results, annotations):
            det = np.asarray(dets[c], np.float32).reshape(-1, 5)
            mask = ann["labels"] == c
            gt = np.asarray(ann["bboxes"], np.float32).reshape(-1, 4)[mask]
            ig_labels = ann.get("labels_ignore")
            if ig_labels is not None:
                ig = np.asarray(ann.get("bboxes_ignore"),
                                np.float32).reshape(-1, 4)[ig_labels == c]
            else:
                ig = np.asarray(ann.get("bboxes_ignore", np.zeros((0, 4))),
                                np.float32).reshape(-1, 4)
            num_gts += len(gt)
            tp, fp = _tpfp_single(det, gt, ig, iou_thr)
            tps.append(tp)
            fps.append(fp)
            scores.append(det[:, 4])
        scores = np.concatenate(scores)
        order = np.argsort(-scores, kind="mergesort")
        tp = np.cumsum(np.concatenate(tps)[order])
        fp = np.cumsum(np.concatenate(fps)[order])
        recalls = tp / max(num_gts, 1e-10)
        precisions = tp / np.maximum(tp + fp, 1e-10)
        ap = average_precision(recalls, precisions, mode) if num_gts else 0.0
        eval_results.append(dict(
            num_gts=num_gts, num_dets=len(scores), ap=ap,
            recall=float(recalls[-1]) if len(recalls) else 0.0,
            precision=float(precisions[-1]) if len(precisions) else 0.0))
    valid = [r["ap"] for r in eval_results if r["num_gts"] > 0]
    mean_ap = float(np.mean(valid)) if valid else 0.0
    if verbose:
        for c, r in enumerate(eval_results):
            print(f"class {c}: gts={r['num_gts']} dets={r['num_dets']} "
                  f"recall={r['recall']:.3f} ap={r['ap']:.3f}")
        print(f"mAP@{iou_thr}: {mean_ap:.4f}")
    return mean_ap, eval_results


def eval_recalls(gts: list, proposals: list, proposal_nums=(100, 300, 1000),
                 iou_thrs=(0.5,)):
    """Proposal recall matrix (reference ``recall.py`` semantics)."""
    proposal_nums = np.asarray(proposal_nums)
    iou_thrs = np.asarray(iou_thrs, float)
    recalls = np.zeros((len(proposal_nums), len(iou_thrs)))
    total_gt = sum(len(g) for g in gts)
    if total_gt == 0:
        return recalls
    for ti, thr in enumerate(iou_thrs):
        for ni, n in enumerate(proposal_nums):
            hit = 0
            for gt, prop in zip(gts, proposals):
                if len(gt) == 0:
                    continue
                p = np.asarray(prop, np.float32).reshape(-1, 5)
                p = p[np.argsort(-p[:, 4])][:n, :4] if p.shape[1] == 5 \
                    else p[:n, :4]
                ious = _iou_xyxy(np.asarray(gt, np.float32), p)
                if ious.size:
                    hit += int((ious.max(axis=1) >= thr).sum())
            recalls[ni, ti] = hit / total_gt
    return recalls
