"""Leveled logging + scan observability counters.

Parity: the reference's env-gated debug logging (c-core/loglevel.c:9-17,
DECIPHON_LOGLEVEL) and its integer progress metric; extended with the
throughput counters the TPU build needs (cells scanned, windows scored,
GCUPS) — the reference has no profiling at all (SURVEY.md §5).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field

__all__ = ["get_logger", "ScanMetrics"]

_LEVELS = {"debug": logging.DEBUG, "info": logging.INFO,
           "warning": logging.WARNING, "error": logging.ERROR,
           "off": logging.CRITICAL + 10}


def get_logger(name: str = "deciphon_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s: %(message)s"))
        logger.addHandler(handler)
        level = os.environ.get("DECIPHON_LOGLEVEL", "warning").lower()
        logger.setLevel(_LEVELS.get(level, logging.WARNING))
    return logger


@dataclass
class ScanMetrics:
    """Throughput accounting for one scan run."""

    windows_scored: int = 0
    cells: int = 0  # L * 5 * K per scored (profile, window)
    pairs_batches: int = 0
    survivors: int = 0
    products: int = 0
    started: float = field(default_factory=time.perf_counter)

    def add_window(self, length: int, core_size: int) -> None:
        self.windows_scored += 1
        self.cells += length * 5 * core_size

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.started

    @property
    def gcups(self) -> float:
        dt = self.elapsed
        return self.cells / dt / 1e9 if dt > 0 else 0.0

    def summary(self) -> dict:
        return {
            "windows_scored": self.windows_scored,
            "cells": self.cells,
            "pairs_batches": self.pairs_batches,
            "survivors": self.survivors,
            "products": self.products,
            "elapsed_s": round(self.elapsed, 3),
            "gcups": round(self.gcups, 3),
        }
