#!/usr/bin/env python
"""Offline pseudo-label score/IoU distribution analysis
(reference parity: tools/compute_distribution.py:20-139)."""

import argparse
import json
import os
import os.path as osp

import numpy as np


def report(anno_dir: str, bins: int = 20):
    scores = []
    counts = []
    per_class = {}
    for name in os.listdir(anno_dir):
        if not name.endswith(".json"):
            continue
        with open(osp.join(anno_dir, name)) as f:
            data = json.load(f)
        counts.append(data.get("targetNum", 0))
        for tag, s in zip(data.get("tags", []),
                          data.get("scores", [1.0] * len(data.get("tags", [])))):
            scores.append(s)
            per_class.setdefault(tag, []).append(s)
    scores = np.asarray(scores)
    counts = np.asarray(counts)
    print(f"images: {len(counts)}  boxes: {len(scores)}  "
          f"boxes/img: {counts.mean():.2f}  empty imgs: {(counts == 0).sum()}")
    if len(scores):
        hist, edges = np.histogram(scores, bins=bins, range=(0, 1))
        for h, e0, e1 in zip(hist, edges[:-1], edges[1:]):
            print(f"  [{e0:.2f},{e1:.2f}): {h}")
        print("per-class mean score / count:")
        for tag in sorted(per_class):
            v = np.asarray(per_class[tag])
            print(f"  {tag}: {v.mean():.3f} ({len(v)})")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("anno_dir")
    p.add_argument("--bins", type=int, default=20)
    a = p.parse_args()
    report(a.anno_dir, a.bins)
