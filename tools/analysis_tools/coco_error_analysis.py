#!/usr/bin/env python
"""Alias of tools/coco_error_analysis.py at the reference's path
(``tools/analysis_tools/coco_error_analysis.py``)."""
import os.path as osp
import runpy
import sys

if __name__ == "__main__":
    sys.argv[0] = osp.join(osp.dirname(osp.abspath(__file__)), "..",
                           "coco_error_analysis.py")
    runpy.run_path(sys.argv[0], run_name="__main__")
