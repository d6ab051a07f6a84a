"""Detection visualization (reference parity:
``mmdet/core/visualization/image.py`` imshow_det_bboxes / gt+det panels)."""

from __future__ import annotations

import numpy as np
import cv2

PALETTE = [(np.array([(37 * i + 101) % 255, (17 * i + 59) % 255,
                      (29 * i + 151) % 255], int)) for i in range(256)]


def imshow_det_bboxes(img, bboxes, labels, class_names=None, score_thr=0.0,
                      thickness=2, font_scale=0.5, out_file=None,
                      colors=None):
    """Draw (N, 4|5) boxes with labels onto a BGR image (returns ndarray)."""
    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    img = img.copy()
    bboxes = np.asarray(bboxes)
    labels = np.asarray(labels).astype(int)
    for box, label in zip(bboxes, labels):
        score = float(box[4]) if len(box) > 4 else None
        if score is not None and score < score_thr:
            continue
        color = tuple(int(c) for c in (
            colors[label] if colors is not None
            else PALETTE[label % len(PALETTE)]))
        x1, y1, x2, y2 = [int(v) for v in box[:4]]
        cv2.rectangle(img, (x1, y1), (x2, y2), color, thickness)
        name = class_names[label] if class_names else str(label)
        text = f"{name}" + (f"|{score:.2f}" if score is not None else "")
        cv2.putText(img, text, (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, 1)
    if out_file:
        cv2.imwrite(out_file, img)
    return img


def imshow_gt_det_bboxes(img, gt_bboxes, gt_labels, det_bboxes, det_labels,
                         class_names=None, score_thr=0.3, out_file=None):
    """Side-by-side GT (green) vs detections (per-class palette)."""
    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    left = imshow_det_bboxes(img, gt_bboxes, gt_labels, class_names,
                             colors=[(0, 255, 0)] * 256)
    right = imshow_det_bboxes(img, det_bboxes, det_labels, class_names,
                              score_thr=score_thr)
    canvas = np.concatenate([left, right], axis=1)
    if out_file:
        cv2.imwrite(out_file, canvas)
    return canvas
