#!/usr/bin/env python
"""Video inference demo (reference parity: ``demo/video_demo.py``):
reads a video, runs the detector per frame, writes an annotated video."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import cv2

from dsl_tpu.apis.inference import (inference_detector, init_detector,
                                    show_result)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("video")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--out", default="video_result.mp4")
    p.add_argument("--fps", type=float, default=None)
    args = p.parse_args()

    bundle = init_detector(args.config, args.checkpoint)
    cap = cv2.VideoCapture(args.video)
    assert cap.isOpened(), f"cannot open {args.video}"
    fps = args.fps or cap.get(cv2.CAP_PROP_FPS) or 20
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        result = inference_detector(bundle, frame)
        vis = show_result(frame, result, score_thr=args.score_thr)
        writer.write(vis)
        n += 1
    cap.release()
    writer.release()
    print(f"processed {n} frames -> {args.out}")


if __name__ == "__main__":
    main()
