"""Logging bootstrap.

Same file+console pattern as the reference (`train_advanced_v4.py:24-32`,
`V3.1/train_advanced_v3.2.py:488-498`) but as an explicit function instead of
an import side effect, and idempotent.
"""

from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def setup_logging(
    log_file: str | None = None, level: int = logging.INFO, force: bool = False
) -> logging.Logger:
    global _CONFIGURED
    logger = logging.getLogger("ic_tpu")
    if _CONFIGURED and not force:
        return logger
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    _CONFIGURED = True
    return logger


def get_logger() -> logging.Logger:
    return setup_logging()
