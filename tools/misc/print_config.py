#!/usr/bin/env python
"""Alias of tools/print_config.py at the reference's path
(``tools/misc/print_config.py``)."""
import os.path as osp
import runpy
import sys

if __name__ == "__main__":
    sys.argv[0] = osp.join(osp.dirname(osp.abspath(__file__)), "..",
                           "print_config.py")
    runpy.run_path(sys.argv[0], run_name="__main__")
