#!/usr/bin/env python
"""Self-supervised (MoCo/SwAV) checkpoint -> mmdet backbone keys (reference
``tools/model_converters/selfsup2mmdet.py``); thin CLI over
``tools/convert_checkpoint.py`` (--style moco|swav via
--selfsup)."""
import argparse
import os.path as osp
import subprocess
import sys

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--selfsup", choices=["moco", "swav"], required=True)
    a = p.parse_args()
    here = osp.dirname(osp.abspath(__file__))
    sys.exit(subprocess.call(
        [sys.executable, osp.join(here, "..", "convert_checkpoint.py"),
         a.src, a.dst, "--style", a.selfsup]))
