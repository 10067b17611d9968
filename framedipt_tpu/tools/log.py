"""Logging singleton (replaces the reference's absl wrapper,
framedipt/tools/log.py:8-17, with stdlib logging)."""
from __future__ import annotations

import logging
import sys

_LOGGER: logging.Logger | None = None


def get_logger(name: str = "framedipt_tpu") -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger(name)
        if not logger.handlers:
            handler = logging.StreamHandler(sys.stderr)
            handler.setFormatter(
                logging.Formatter(
                    "%(asctime)s %(levelname)s %(name)s: %(message)s",
                    datefmt="%H:%M:%S",
                )
            )
            logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False  # avoid duplicate lines via the root logger
        _LOGGER = logger
    return _LOGGER
