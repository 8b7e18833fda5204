"""Profiling / throughput telemetry.

The reference's only perf instrumentation is steps/sec timed around
``torch.cuda.synchronize()`` (train.py:271-288) plus an offline, gitignored
FLOP counter (.gitignore:23).  The TPU build makes profiling first-class:

* ``StepProfiler`` drives ``jax.profiler`` traces over a configured step
  window (``profile_dir`` / ``profile_start_step`` / ``profile_steps`` config
  keys); traces open in XProf/TensorBoard and show MXU utilisation, HBM
  traffic, and per-op fusion.
* ``Throughput`` reports steps/sec, images/sec and images/sec/chip between
  log points (the BASELINE.json headline unit).
* ``model_flops`` estimates analytic fwd FLOPs of a DiffMa config so logs can
  print achieved model FLOP/s alongside the device peak.
"""

from __future__ import annotations

import time
from typing import Optional

import jax

__all__ = ["StepProfiler", "Throughput", "model_flops"]


class StepProfiler:
    """Start/stop a jax.profiler trace over steps [start, start+steps)."""

    def __init__(
        self,
        profile_dir: Optional[str],
        start_step: int = 10,
        num_steps: int = 5,
        enabled: bool = True,
    ):
        self.dir = profile_dir
        self.start_step = int(start_step)
        self.stop_step = int(start_step) + int(num_steps)
        self.enabled = bool(profile_dir) and enabled
        self._active = False

    def step(self, step: int) -> None:
        """Call once per training step with the global step number."""
        if not self.enabled:
            return
        # >= so the window still fires when training resumes from a
        # checkpoint past start_step; stop is re-anchored to the actual start.
        if not self._active and step >= self.start_step:
            jax.profiler.start_trace(self.dir)
            self._active = True
            self.stop_step = step + (self.stop_step - self.start_step)
        elif self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            self.enabled = False  # one window per run

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class Throughput:
    """Steps/sec + images/sec(/chip) between ``report`` calls."""

    def __init__(self, global_batch: int):
        self.global_batch = int(global_batch)
        self.n_chips = jax.device_count()
        self._t0 = time.time()
        self._steps = 0

    def tick(self, n: int = 1) -> None:
        self._steps += n

    def report(self) -> dict:
        dt = max(time.time() - self._t0, 1e-9)
        steps_s = self._steps / dt
        img_s = steps_s * self.global_batch
        out = {
            "steps_per_sec": steps_s,
            "images_per_sec": img_s,
            "images_per_sec_per_chip": img_s / self.n_chips,
        }
        self._t0 = time.time()
        self._steps = 0
        return out


def model_flops(
    depth: int,
    hidden: int = 512,
    tokens: int = 196,
    d_state: int = 16,
    streams: int = 3,
    dual_branch: bool = True,
) -> float:
    """Analytic forward FLOPs of one DiffMa denoiser call (batch 1).

    Counts the mixer matmuls (in/x/dt/out projections) and the selective-scan
    elementwise recurrence per scan stream; the dual-branch Spiral block runs
    two mixers (block/mamba_block.py:107-108).  Attention/MLP terms of the
    DiT reproduction are out of scope.
    """
    d_in = 2 * hidden
    rank = -(-hidden // 16)
    # per mixer, per token: in_proj + x_proj + dt_proj + out_proj matmuls
    proj = 2 * hidden * (2 * d_in) + streams * (
        2 * d_in * (rank + 2 * d_state) + 2 * rank * d_in
    ) + 2 * d_in * hidden
    # selective scan: ~9 flops per (token, channel, state) per stream
    scan = streams * 9 * d_in * d_state
    per_token = proj + scan
    mixers = 2 if dual_branch else 1
    return float(depth * mixers * tokens * per_token)
