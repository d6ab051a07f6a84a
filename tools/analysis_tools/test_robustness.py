#!/usr/bin/env python
"""Alias of tools/test_robustness.py at the reference's path
(``tools/analysis_tools/test_robustness.py``)."""
import os.path as osp
import runpy
import sys

if __name__ == "__main__":
    sys.argv[0] = osp.join(osp.dirname(osp.abspath(__file__)), "..",
                           "test_robustness.py")
    runpy.run_path(sys.argv[0], run_name="__main__")
