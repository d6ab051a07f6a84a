#!/usr/bin/env python
"""Training CLI (reference parity: ``tools/train.py``).

Usage:
  python tools/train.py CONFIG [--work-dir DIR] [--resume-from CKPT]
      [--seed N] [--cfg-options k=v ...]

Single host: one process drives every local TPU device through the mesh
(SURVEY.md §2.3: torch DDP ranks → jit over the data axis). Multi-host:
``--launcher jax`` (env COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID, see
tools/dist_train.sh) or ``--launcher slurm`` (auto-detected by
jax.distributed.initialize) — replacing torch.distributed.launch.
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from dsl_tpu.config import Config
from dsl_tpu.config.config import DictAction


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector")
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", help="dir to save logs and checkpoints")
    p.add_argument("--resume-from", help="checkpoint to resume from")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-devices", type=int, default=None,
                   help="limit the number of devices in the mesh")
    p.add_argument("--cfg-options", nargs="+", action=DictAction,
                   help="override config: key=value with dots for nesting")
    p.add_argument("--launcher", choices=["none", "jax", "slurm"],
                   default="none",
                   help="multi-host init (jax: COORDINATOR_ADDRESS/"
                        "NUM_PROCESSES/PROCESS_ID env; slurm: auto)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.launcher != "none":
        import os as _os

        from dsl_tpu.parallel.dist import init_dist

        if args.launcher == "jax":
            init_dist(
                coordinator_address=_os.environ.get("COORDINATOR_ADDRESS"),
                num_processes=int(_os.environ.get("NUM_PROCESSES", "1")),
                process_id=int(_os.environ.get("PROCESS_ID", "0")))
        else:           # slurm: jax auto-detects the cluster env
            init_dist()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    work_dir = args.work_dir or osp.join(
        "./work_dirs", osp.splitext(osp.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    cfg.dump(osp.join(work_dir, osp.basename(args.config)))

    from dsl_tpu.apis.train import train_detector

    train_detector(cfg, work_dir, resume_from=args.resume_from,
                   seed=args.seed, max_devices=args.max_devices)


if __name__ == "__main__":
    main()
