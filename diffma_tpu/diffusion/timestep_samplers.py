"""Timestep samplers (diffusion/timestep_sampler.py).

``UniformSampler`` draws with explicit JAX RNG.  ``LossSecondMomentResampler``
keeps its loss history on the host exactly like the reference (numpy,
deterministic across processes); cross-process synchronisation uses
``multihost_utils.process_allgather`` when a multi-host runtime is
initialised, replacing the reference's padded NCCL all_gather dance
(timestep_sampler.py:82-103).
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ScheduleSampler",
    "UniformSampler",
    "LossAwareSampler",
    "LossSecondMomentResampler",
    "create_named_schedule_sampler",
]


def create_named_schedule_sampler(name: str, diffusion):
    if name == "uniform":
        return UniformSampler(diffusion)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(diffusion)
    raise NotImplementedError(f"unknown schedule sampler: {name}")


class ScheduleSampler(abc.ABC):
    """Importance sampler over diffusion timesteps."""

    @abc.abstractmethod
    def weights(self) -> np.ndarray:
        ...

    def sample(self, batch_size: int, rng: jax.Array):
        """Returns (timesteps (B,), loss weights (B,))."""
        w = np.asarray(self.weights(), np.float64)
        p = w / w.sum()
        logits = jnp.log(jnp.asarray(p, jnp.float32))[None].repeat(batch_size, 0)
        indices = jax.random.categorical(rng, logits, axis=-1)
        weights = 1.0 / (len(p) * jnp.take(jnp.asarray(p, jnp.float32), indices))
        return indices, weights


class UniformSampler(ScheduleSampler):
    def __init__(self, diffusion):
        self.diffusion = diffusion
        self._weights = np.ones([diffusion.num_timesteps])

    def weights(self):
        return self._weights


class LossAwareSampler(ScheduleSampler):
    def update_with_local_losses(self, local_ts, local_losses):
        """Synchronise per-timestep losses across processes, then update.
        Single-process: a straight pass-through."""
        ts = np.asarray(local_ts)
        losses = np.asarray(local_losses, np.float64)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            ts = np.asarray(multihost_utils.process_allgather(ts)).reshape(-1)
            losses = np.asarray(
                multihost_utils.process_allgather(losses)
            ).reshape(-1)
        self.update_with_all_losses(ts.tolist(), losses.tolist())

    @abc.abstractmethod
    def update_with_all_losses(self, ts, losses):
        ...


class LossSecondMomentResampler(LossAwareSampler):
    def __init__(self, diffusion, history_per_term: int = 10, uniform_prob: float = 0.001):
        self.diffusion = diffusion
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros(
            [diffusion.num_timesteps, history_per_term], dtype=np.float64
        )
        self._loss_counts = np.zeros([diffusion.num_timesteps], dtype=np.int64)

    def weights(self):
        if not self._warmed_up():
            return np.ones([self.diffusion.num_timesteps], dtype=np.float64)
        w = np.sqrt(np.mean(self._loss_history**2, axis=-1))
        w /= w.sum()
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def update_with_all_losses(self, ts, losses):
        for t, loss in zip(ts, losses):
            t = int(t)
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1

    def _warmed_up(self):
        return (self._loss_counts == self.history_per_term).all()
