#!/usr/bin/env python
"""Strip optimizer state from a checkpoint and hash-suffix it
(reference parity: tools/model_converters/publish_model.py)."""

import argparse
import hashlib
import json
import os.path as osp
import shutil
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_ckpt", help="checkpoint path prefix (without .orbax)")
    p.add_argument("out_prefix")
    p.add_argument("--teacher", action="store_true",
                   help="publish the EMA teacher weights")
    args = p.parse_args()

    from dsl_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    state, meta = load_checkpoint(args.in_ckpt, None)
    params = state["teacher_params" if args.teacher else "params"] \
        if isinstance(state, dict) else state.params
    stats = state.get("batch_stats", {}) if isinstance(state, dict) else \
        state.batch_stats
    published = dict(params=params, batch_stats=stats)
    tmp = args.out_prefix + "_tmp"
    save_checkpoint(tmp, published, meta=dict(meta, published=True))
    # hash over the meta file for a stable suffix
    with open(tmp + ".meta.json", "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:8]
    final = f"{args.out_prefix}-{digest}"
    for suffix in (".orbax", ".meta.json", ".npz.d"):
        if osp.exists(tmp + suffix):
            shutil.move(tmp + suffix, final + suffix)
    print(f"published to {final}")


if __name__ == "__main__":
    main()
