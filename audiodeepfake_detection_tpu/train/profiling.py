"""Tracing and step-time observability.

The reference has no profiling at all (SURVEY.md §5: only tqdm bars and
SLURM wall-clock echoes).  Here:

* ``trace(dir)``       — context manager around ``jax.profiler`` trace
  capture; view with TensorBoard's profile plugin or Perfetto.
* ``StepTimer``        — cheap wall-clock step/frames-per-second counters
  the Trainer logs per epoch (works with async dispatch: rates are computed
  over windows that end on a host sync).
* ``annotate(name)``   — ``jax.profiler.TraceAnnotation`` wrapper so trainer
  phases show up on the trace timeline.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-time / throughput counter."""

    def __init__(self, frames_per_step: int) -> None:
        self.frames_per_step = frames_per_step
        self.reset()

    def reset(self) -> None:
        self.start = time.time()
        self.steps = 0

    def step(self) -> None:
        self.steps += 1

    @property
    def seconds(self) -> float:
        return time.time() - self.start

    @property
    def steps_per_sec(self) -> float:
        return self.steps / max(self.seconds, 1e-9)

    @property
    def frames_per_sec(self) -> float:
        return self.steps_per_sec * self.frames_per_step

    def summary(self) -> str:
        return (
            f"{self.steps} steps in {self.seconds:.1f}s "
            f"({self.steps_per_sec:.2f} steps/s, "
            f"{self.frames_per_sec:.0f} frames/s)"
        )
