#!/usr/bin/env python
"""Single-image demo (reference parity: ``demo/image_demo.py``)."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from dsl_tpu.apis.inference import (inference_detector, init_detector,
                                    show_result)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("img")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--out-file", default="demo_result.jpg")
    args = p.parse_args()

    bundle = init_detector(args.config, args.checkpoint)
    result = inference_detector(bundle, args.img)
    show_result(args.img, result, score_thr=args.score_thr,
                out_file=args.out_file)
    n = sum(len(r) for r in result)
    print(f"{n} detections; visualization saved to {args.out_file}")


if __name__ == "__main__":
    main()
