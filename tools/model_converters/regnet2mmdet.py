#!/usr/bin/env python
"""pycls RegNet checkpoint -> mmdet key style (reference
``tools/model_converters/regnet2mmdet.py``); thin CLI over
``tools/convert_checkpoint.py --style regnet``."""
import os.path as osp
import subprocess
import sys

if __name__ == "__main__":
    here = osp.dirname(osp.abspath(__file__))
    sys.exit(subprocess.call(
        [sys.executable, osp.join(here, "..", "convert_checkpoint.py")]
        + sys.argv[1:] + ["--style", "regnet"]))
