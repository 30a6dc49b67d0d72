"""Learning-rate schedules as optax-compatible callables.

The reference builds SGDR cosine restarts but never wires it into the
optimizer (reference train.py:185-186,197 — Nadam runs at constant LR);
here the schedule is wired by default (TrainConfig.use_schedule) with a
constant-LR parity mode.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_decay_restarts(initial_learning_rate: float,
                          first_decay_steps: int, t_mul: float = 2.0,
                          m_mul: float = 1.0, alpha: float = 0.0):
    """SGDR schedule, numerically matching the reference lr_schedule.py:19-86."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        completed = step / first_decay_steps

        if t_mul == 1.0:
            i_restart = jnp.floor(completed)
            frac = completed - i_restart
        else:
            i_restart = jnp.floor(
                jnp.log(1.0 - completed * (1.0 - t_mul)) / math.log(t_mul))
            sum_r = (1.0 - t_mul ** i_restart) / (1.0 - t_mul)
            frac = (completed - sum_r) / t_mul ** i_restart

        m_fac = m_mul ** i_restart
        cosine_decayed = 0.5 * m_fac * (1.0 + jnp.cos(math.pi * frac))
        decayed = (1.0 - alpha) * cosine_decayed + alpha
        return initial_learning_rate * decayed

    return schedule


def transformer_schedule(d_model: int, warmup_steps: int = 4000):
    """rsqrt warmup schedule (reference lr_schedule.py:4-17, unused in
    training but part of the inventory)."""

    def schedule(step):
        step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        arg1 = step ** -0.5
        arg2 = step * (warmup_steps ** -1.5)
        return (d_model ** -0.5) * jnp.minimum(arg1, arg2)

    return schedule
