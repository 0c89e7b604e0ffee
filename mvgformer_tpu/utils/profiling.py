"""Profiling: stage timers and XLA trace capture.

TPU-native replacement of the reference's hand-rolled instrumentation
(AverageMeter wall-clock timers around forward stages,
/root/reference/lib/models/dq_transformer.py:84-88 and
lib/models/dq_decoder.py:88-94, with cuda.synchronize-based
time_synchronized, lib/models/mvp_decoder.py:44-46).

Under jit the per-stage breakdown comes from compiled sub-programs: wrap
stage callables with StageTimer.wrap to time them as separate jitted calls
with honest host readbacks (block_until_ready can return early under remote
TPU relays), or capture a full XLA trace with `trace()` for xprof.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict

import jax
import jax.numpy as jnp


class StageTimer:
    """Accumulates honest wall-clock per named stage."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        yield
        self.totals[name] += time.perf_counter() - start
        self.counts[name] += 1

    def time_fn(self, name: str, fn: Callable, *args, force: bool = True,
                **kwargs):
        """Run fn, force completion via a scalar readback, record time."""
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        if force:
            leaves = jax.tree_util.tree_leaves(out)
            if leaves:
                float(jnp.sum(leaves[0]))
        self.totals[name] += time.perf_counter() - start
        self.counts[name] += 1
        return out

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in sorted(self.totals)}

    def format(self) -> str:
        return " | ".join(f"{k}={v * 1000:.1f}ms"
                          for k, v in self.summary().items())


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mvgformer_trace"):
    """Capture an XLA/xprof trace of the enclosed block
    (jax.profiler; view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
