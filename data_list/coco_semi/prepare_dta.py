#!/usr/bin/env python
"""STAC-protocol COCO semi split prep at the reference's path
(``data_list/coco_semi/prepare_dta.py``). The implementation lives in
``tools/prepare_coco_semi_splits.py`` (same
``instances_train2017.{seed}@{percent}.json`` outputs); this alias keeps
the reference tree layout."""
import os.path as osp
import runpy
import sys

if __name__ == "__main__":
    sys.argv[0] = osp.join(osp.dirname(osp.abspath(__file__)), "..", "..",
                           "tools", "prepare_coco_semi_splits.py")
    runpy.run_path(sys.argv[0], run_name="__main__")
