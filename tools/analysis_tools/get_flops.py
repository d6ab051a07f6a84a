#!/usr/bin/env python
"""Alias of tools/get_flops.py at the reference's path
(``tools/analysis_tools/get_flops.py``)."""
import os.path as osp
import runpy
import sys

if __name__ == "__main__":
    sys.argv[0] = osp.join(osp.dirname(osp.abspath(__file__)), "..",
                           "get_flops.py")
    runpy.run_path(sys.argv[0], run_name="__main__")
