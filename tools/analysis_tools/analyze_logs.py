#!/usr/bin/env python
"""Alias of tools/analyze_logs.py at the reference's path
(``tools/analysis_tools/analyze_logs.py``)."""
import os.path as osp
import runpy
import sys

if __name__ == "__main__":
    sys.argv[0] = osp.join(osp.dirname(osp.abspath(__file__)), "..",
                           "analyze_logs.py")
    runpy.run_path(sys.argv[0], run_name="__main__")
