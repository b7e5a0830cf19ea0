"""Structured run logging (parity: notebooks/ETL_Entregas_Base.ipynb:62-110).

Same record format as NB:86 (`%(asctime)s - %(levelname)s - %(message)s`),
file + stream handlers, per-stage info and per-country error capture.
"""

from __future__ import annotations

import logging
import os
import time

_FORMAT = "%(asctime)s - %(levelname)s - %(message)s"


def build_logger(log_dir: str | None = None, name: str = "etl_global_mobility") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if logger.handlers:
        return logger
    fmt = logging.Formatter(_FORMAT)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d_%H%M%S")
        fh = logging.FileHandler(os.path.join(log_dir, f"run_{stamp}.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def close_logger(logger: logging.Logger) -> None:
    """cerrar_log parity (NB:105-110): flush + detach handlers."""
    for h in list(logger.handlers):
        h.flush()
        h.close()
        logger.removeHandler(h)
