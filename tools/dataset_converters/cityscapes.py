"""Convert Cityscapes gtFine instance annotations to COCO json.

Parity with ``/root/reference/tools/dataset_converters/cityscapes.py``:
walks ``leftImg8bit/{split}``, reads the matching
``gtFine_instanceIds.png``, and emits one COCO-format
``instancesonly_filtered_gtFine_{split}.json`` with the 8 instance
classes. The cityscapesscripts label table is inlined (ids 24-33 with
``hasInstances`` and not ``ignoreInEval``); instance ids >= 1000 encode
``label_id * 1000 + instance`` and ids < 1000 whole-label regions are
crowd (``load_img_info`` :39-82).
"""

import argparse
import glob
import json
import os.path as osp

import numpy as np

# (label_id, name) for hasInstances & not ignoreInEval
CITYSCAPES_INSTANCE_LABELS = [
    (24, "person"), (25, "rider"), (26, "car"), (27, "truck"),
    (28, "bus"), (31, "train"), (32, "motorcycle"), (33, "bicycle")]
_VALID = {i for i, _ in CITYSCAPES_INSTANCE_LABELS}


def mask_to_ann(mask: np.ndarray, category_id: int, iscrowd: int,
                ann_id: int, img_id: int) -> dict:
    from dsl_tpu.core.masks import encode_rle

    ys, xs = np.where(mask)
    x1, y1 = int(xs.min()), int(ys.min())
    x2, y2 = int(xs.max()) + 1, int(ys.max()) + 1
    return dict(id=ann_id, image_id=img_id, category_id=category_id,
                bbox=[x1, y1, x2 - x1, y2 - y1],
                area=int(mask.sum()), iscrowd=iscrowd,
                segmentation=encode_rle(mask.astype(np.uint8)))


def load_img_info(img_path: str, inst_path: str, img_id: int,
                  ann_start: int):
    import cv2

    inst = cv2.imread(inst_path, cv2.IMREAD_UNCHANGED)
    if inst is None:
        raise FileNotFoundError(inst_path)
    h, w = inst.shape[:2]
    anns = []
    ann_id = ann_start
    for inst_id in np.unique(inst):
        if inst_id < 24:          # stuff labels
            continue
        label_id = inst_id // 1000 if inst_id >= 1000 else inst_id
        if label_id not in _VALID:
            continue
        iscrowd = int(inst_id < 1000)
        mask = inst == inst_id
        if not mask.any():
            continue
        anns.append(mask_to_ann(mask, int(label_id), iscrowd, ann_id,
                                img_id))
        ann_id += 1
    info = dict(id=img_id, file_name=osp.basename(img_path),
                width=w, height=h)
    return info, anns


def convert(img_dir: str, gt_dir: str, out_json: str):
    images, annotations = [], []
    paths = sorted(glob.glob(osp.join(img_dir, "**", "*_leftImg8bit.png"),
                             recursive=True))
    for img_id, img_path in enumerate(paths):
        rel = osp.relpath(img_path, img_dir)
        inst_path = osp.join(
            gt_dir, rel.replace("_leftImg8bit.png",
                                "_gtFine_instanceIds.png"))
        info, anns = load_img_info(img_path, inst_path, img_id,
                                   len(annotations) + 1)
        info["file_name"] = rel
        images.append(info)
        annotations.extend(anns)
    cats = [dict(id=i, name=n) for i, n in CITYSCAPES_INSTANCE_LABELS]
    with open(out_json, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=cats), f)
    print(f"wrote {out_json}: {len(images)} images, "
          f"{len(annotations)} annotations")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cityscapes_path", help="dir with leftImg8bit/ gtFine/")
    p.add_argument("--splits", nargs="+", default=["train", "val"])
    p.add_argument("--out-dir", default=None)
    args = p.parse_args()
    out_dir = args.out_dir or osp.join(args.cityscapes_path, "annotations")
    import os

    os.makedirs(out_dir, exist_ok=True)
    for split in args.splits:
        convert(osp.join(args.cityscapes_path, "leftImg8bit", split),
                osp.join(args.cityscapes_path, "gtFine", split),
                osp.join(out_dir,
                         f"instancesonly_filtered_gtFine_{split}.json"))


if __name__ == "__main__":
    main()
