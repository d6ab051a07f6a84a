#!/usr/bin/env python
"""Create a GIF from per-image detection visualizations (reference parity:
``demo/create_result_gif.py``, without matplotlib's imagemagick dep —
PIL writes the gif)."""

import argparse
import glob
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import cv2
from PIL import Image

from dsl_tpu.apis.inference import (inference_detector, init_detector,
                                    show_result)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("image_dir")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--out", default="result.gif")
    p.add_argument("--duration-ms", type=int, default=500)
    args = p.parse_args()

    bundle = init_detector(args.config, args.checkpoint)
    frames = []
    for path in sorted(glob.glob(osp.join(args.image_dir, "*"))):
        img = cv2.imread(path)
        if img is None:
            continue
        result = inference_detector(bundle, img)
        vis = show_result(img, result, score_thr=args.score_thr)
        frames.append(Image.fromarray(cv2.cvtColor(vis, cv2.COLOR_BGR2RGB)))
    assert frames, f"no readable images in {args.image_dir}"
    frames[0].save(args.out, save_all=True, append_images=frames[1:],
                   duration=args.duration_ms, loop=0)
    print(f"wrote {args.out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
