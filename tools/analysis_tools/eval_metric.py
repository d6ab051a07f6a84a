#!/usr/bin/env python
"""Alias of tools/eval_metric.py at the reference's path
(``tools/analysis_tools/eval_metric.py``)."""
import os.path as osp
import runpy
import sys

if __name__ == "__main__":
    sys.argv[0] = osp.join(osp.dirname(osp.abspath(__file__)), "..",
                           "eval_metric.py")
    runpy.run_path(sys.argv[0], run_name="__main__")
