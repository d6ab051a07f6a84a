#!/usr/bin/env python
"""Alias of tools/publish_model.py at the reference's path
(``tools/model_converters/publish_model.py``)."""
import os.path as osp
import runpy
import sys

if __name__ == "__main__":
    sys.argv[0] = osp.join(osp.dirname(osp.abspath(__file__)), "..",
                           "publish_model.py")
    runpy.run_path(sys.argv[0], run_name="__main__")
