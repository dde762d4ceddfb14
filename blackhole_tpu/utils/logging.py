"""Leveled, structured logging.

The reference logs with bare printf and ad-hoc tags ([DEBUG-RKF45],
[ERROR] — math_util.c:222, raytracer.c:351) and throttles chatty sites
by call count (renderer.cpp:1222-1226).  This module provides the same
capabilities on Python's logging stack: level filtering, an every-Nth
throttle, and rate metadata — without printf in device code (use
jax.debug.print inside jitted functions when needed).
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s %(levelname)s %(name)s: %(message)s"
_configured = False


def get_logger(name: str = "blackhole_tpu", level: str = "INFO"
               ) -> logging.Logger:
    global _configured
    if not _configured:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        root = logging.getLogger("blackhole_tpu")
        root.addHandler(handler)
        root.propagate = False
        _configured = True
    logger = logging.getLogger(name)
    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    return logger


class Throttled:
    """Log only every Nth call (renderer.cpp:1222-1226 analog)."""

    def __init__(self, logger: logging.Logger, every: int = 500):
        self.logger = logger
        self.every = every
        self.count = 0

    def log(self, level, msg, *args):
        self.count += 1
        if self.count % self.every == 1:
            self.logger.log(
                level, f"{msg} (call {self.count})", *args
            )
