"""Logging + per-stage wall-clock tracing.

Equivalent of reference utils/logger_util.py:6-47 (file+stream logger) and
the ad-hoc `time.time()` stage deltas sprinkled through demo.py /
ours_utils.py.  Here tracing is a small context-manager registry so every
pipeline stage is timed uniformly; `jax.block_until_ready` is applied to
stage outputs when requested so device-async work is attributed correctly.
"""
from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Dict, List, Optional


def get_logger(log_file: Optional[str] = None, name: str = "pointdreamer_tpu"):
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter(
        "[%(asctime)s][%(levelname)s] %(message)s", datefmt="%H:%M:%S"
    )
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class StageTimer:
    """Accumulates named stage timings for one pipeline run."""

    def __init__(self, logger=None, sync=True):
        self.logger = logger
        self.sync = sync
        self.times: Dict[str, float] = {}
        self.order: List[str] = []

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            if self.sync:
                val = box.get("out", sync_value)
                if val is not None:
                    try:
                        import jax

                        jax.block_until_ready(val)
                    except Exception:
                        pass
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            if name not in self.order:
                self.order.append(name)
            if self.logger:
                self.logger.info(f"{name}: {dt:.3f} s")

    def total(self) -> float:
        return sum(self.times.values())

    def report(self) -> str:
        lines = [f"  {k}: {self.times[k]:.3f} s" for k in self.order]
        lines.append(f"  total: {self.total():.3f} s")
        return "\n".join(lines)
