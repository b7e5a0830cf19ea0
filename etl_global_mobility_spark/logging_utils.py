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


def observe_counts(df, name: str, *, value_col: str | None = None):
    """Attach free run metrics to a DataFrame via ``df.observe``:
    row count (+ null count of ``value_col`` if given), collected as a
    side effect of whatever action executes the frame — NO second scan,
    unlike a separate ``df.count()``, which at 100 TB doubles the read.

    Returns ``(df, observation)``; read ``observation.get`` AFTER an
    action has run. The reference logs row counts per stage (NB:88-90)
    by re-counting; this is the scan-free production equivalent.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if value_col is not None:
        metrics.append(
            F.sum(F.col(value_col).isNull().cast("long")).alias(
                f"n_null_{value_col}"
            )
        )
    return df.observe(obs, *metrics), obs
