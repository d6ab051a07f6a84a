#!/usr/bin/env python
"""Webcam demo (reference parity: ``demo/webcam_demo.py``): live capture +
detection overlay. Headless environments can use ``--out-dir`` to dump
annotated frames instead of opening a window."""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import cv2

from dsl_tpu.apis.inference import (inference_detector, init_detector,
                                    show_result)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--camera-id", type=int, default=0)
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--out-dir", default=None,
                   help="dump frames here instead of cv2.imshow")
    p.add_argument("--max-frames", type=int, default=0)
    args = p.parse_args()

    bundle = init_detector(args.config, args.checkpoint)
    cap = cv2.VideoCapture(args.camera_id)
    assert cap.isOpened(), f"cannot open camera {args.camera_id}"
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        result = inference_detector(bundle, frame)
        vis = show_result(frame, result, score_thr=args.score_thr)
        if args.out_dir:
            cv2.imwrite(osp.join(args.out_dir, f"frame_{i:06d}.jpg"), vis)
        else:
            cv2.imshow("dsl_tpu", vis)
            if cv2.waitKey(1) == 27:       # ESC
                break
        i += 1
        if args.max_frames and i >= args.max_frames:
            break
    cap.release()


if __name__ == "__main__":
    main()
