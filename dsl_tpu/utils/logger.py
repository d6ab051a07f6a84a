"""Root logger (reference ``mmdet/utils/logger.py:6-19`` parity)."""

from __future__ import annotations

import logging
import os
import os.path as osp

_LOGGERS = {}


def get_root_logger(log_file: str | None = None,
                    log_level: int = logging.INFO,
                    name: str = "dsl_tpu") -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(log_level)
    logger.propagate = False
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(osp.dirname(osp.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _LOGGERS[name] = logger
    return logger
