"""Tracing / profiling helpers (SURVEY §5 "Tracing / profiling").

The reference sprinkles tic/toc prints through every kernel and driver
(polyphase_analysis.m:40,124-127; sgcht.m:502,577-578). The TPU-native
equivalents here:

* :class:`StageTimer` — per-stage wall-clock + samples/s counters with a
  one-line report, for driver block loops (device work is made observable
  by blocking on the stage's outputs);
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard/XProf trace directory when profiling is requested
  (``SKA_PST_TRACE_DIR`` or an explicit path), and a no-op otherwise, so
  drivers can leave it permanently in place.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Dict, Optional

module_logger = logging.getLogger(__name__)


class StageTimer:
    """Accumulate wall-clock and item counts per named stage.

    >>> t = StageTimer()
    >>> with t.stage("analysis", samples=n):
    ...     out = jax.block_until_ready(analyze(x))
    >>> t.report()
    """

    def __init__(self):
        self.seconds: Dict[str, float] = {}
        self.items: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, samples: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.seconds[name] = self.seconds.get(name, 0.0) + dt
            self.items[name] = self.items.get(name, 0) + samples

    def report(self, log=None) -> Dict[str, dict]:
        out = {}
        for name, sec in self.seconds.items():
            n = self.items.get(name, 0)
            entry = {"seconds": round(sec, 4)}
            if n and sec > 0:
                entry["msamples_per_s"] = round(n / sec / 1e6, 2)
            out[name] = entry
            (log or module_logger.info)("%s: %s", name, entry)
        return out


@contextlib.contextmanager
def trace(trace_dir: Optional[str] = None):
    """jax.profiler trace scope; no-op unless a directory is given or
    SKA_PST_TRACE_DIR is set."""
    trace_dir = trace_dir or os.environ.get("SKA_PST_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    module_logger.info("profiler trace written to %s", trace_dir)
