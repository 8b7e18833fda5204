"""Train state and the jitted training step.

Replicates the reference training semantics (train.py:219-303) exactly,
device-side:

* hybrid diffusion loss, mean over the batch (train.py:247-249);
* NaN-loss skip: a non-finite loss leaves state untouched and does not count
  a step (train.py:254-256 ``continue``) -- expressed with ``lax.cond`` in
  the accumulating path and with predicated ``jnp.where`` masking in the
  ``accumulation_steps == 1`` fast path (same semantics, no branch copies);
* gradient accumulation with the reference's quirks kept deliberately:
  the loss is NOT divided by accumulation_steps, and the optimizer fires on
  iterations where the *pre-increment* step counter satisfies
  ``step % accumulation_steps == 0`` (train.py:261-265);
* EMA (decay 0.999) updated only on optimizer-step iterations over all
  parameters (train.py:33-43,263-264), initialised as a copy (decay-0 update,
  train.py:201).

Everything lives in one pjit-able function; gradients are averaged across
the dp mesh axis by XLA (the sharded batch makes the mean a psum), replacing
DDP bucket all-reduce.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "update_ema", "make_train_step"]


@flax.struct.dataclass
class TrainState:
    step: jax.Array  # ()
    params: Any
    ema_params: Any
    opt_state: Any
    accum_grads: Any

    @staticmethod
    def create(params, optimizer: optax.GradientTransformation) -> "TrainState":
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=jax.tree.map(jnp.copy, params),
            opt_state=optimizer.init(params),
            accum_grads=jax.tree.map(jnp.zeros_like, params),
        )


def update_ema(ema_params, params, decay: float = 0.999):
    """ema = decay*ema + (1-decay)*params (train.py:33-43)."""
    return jax.tree.map(lambda e, p: e * decay + p.astype(e.dtype) * (1 - decay),
                        ema_params, params)


def make_train_step(
    loss_fn: Callable[[Any, Dict[str, jax.Array], jax.Array], jax.Array],
    optimizer: optax.GradientTransformation,
    accumulation_steps: int = 1,
    ema_decay: float = 0.999,
):
    """Build the jitted step.  ``loss_fn(params, batch, rng) -> scalar``."""

    def train_step_predicated(state: TrainState, batch, rng):
        """accumulation_steps == 1 fast path: the NaN-skip and the update
        are predicated with ``jnp.where`` instead of ``lax.cond``.  The two
        nested conds cost ~4 ms/step at B/2 bs64 on a v5e (xprof: the
        untaken identity branch still copies the whole param/opt tree);
        the where-form runs the optimizer unconditionally and masks the
        result, which XLA fuses into the update loop.  Semantics identical:
        a non-finite loss leaves params/EMA/opt state/step untouched
        (grads are zeroed before they reach the optimizer, so NaNs never
        poison m/v even transiently)."""
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = update_ema(state.ema_params, new_params, ema_decay)

        def keep_old(new, old):
            return jax.tree.map(lambda n, o: jnp.where(finite, n, o), new, old)

        return TrainState(
            step=state.step + finite.astype(state.step.dtype),
            params=keep_old(new_params, state.params),
            ema_params=keep_old(new_ema, state.ema_params),
            opt_state=keep_old(new_opt, state.opt_state),
            accum_grads=state.accum_grads,
        ), {"loss": loss, "finite": finite, **aux}

    def train_step(state: TrainState, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        finite = jnp.isfinite(loss)

        def do_apply(state):
            accum = jax.tree.map(jnp.add, state.accum_grads, grads)
            is_update = state.step % accumulation_steps == 0

            def apply(_):
                updates, new_opt = optimizer.update(
                    accum, state.opt_state, state.params
                )
                new_params = optax.apply_updates(state.params, updates)
                new_ema = update_ema(state.ema_params, new_params, ema_decay)
                zeros = jax.tree.map(jnp.zeros_like, accum)
                return new_params, new_ema, new_opt, zeros

            def keep(_):
                return state.params, state.ema_params, state.opt_state, accum

            params, ema, opt_state, accum = jax.lax.cond(is_update, apply, keep, None)
            return TrainState(
                step=state.step + 1,
                params=params,
                ema_params=ema,
                opt_state=opt_state,
                accum_grads=accum,
            )

        new_state = jax.lax.cond(finite, do_apply, lambda s: s, state)
        return new_state, {"loss": loss, "finite": finite, **aux}

    if accumulation_steps == 1:
        return train_step_predicated
    return train_step
