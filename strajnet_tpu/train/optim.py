"""Exact Keras Nadam as an optax transform.

``optax.nadam`` is Adam-with-Nesterov and omits Keras Nadam's momentum-decay
schedule (the u_t = beta1*(1 - 0.5*0.96^(0.004 t)) momentum-cache products),
so its dynamics differ slightly from the reference's
``tf.keras.optimizers.Nadam`` (reference train.py:197). This transform
implements the Keras update rule exactly (keras/optimizers/nadam.py):

    local_step = t + 1
    u_t   = beta1 * (1 - 0.5 * 0.96**(0.004 * local_step))
    u_t+1 = beta1 * (1 - 0.5 * 0.96**(0.004 * (local_step + 1)))
    U_t   = U_{t-1} * u_t                    (momentum-cache product, U_0 = 1)
    m <- beta1 m + (1-beta1) g ;  v <- beta2 v + (1-beta2) g^2
    m_hat = u_t+1 m / (1 - U_t * u_t+1) + (1 - u_t) g / (1 - U_t)
    v_hat = v / (1 - beta2**local_step)
    update = -lr * m_hat / (sqrt(v_hat) + eps)

Golden-tested against tf.keras Nadam in tests/test_optim.py.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class KerasNadamState(NamedTuple):
    count: chex.Array       # int32 step counter (t)
    mu: optax.Updates
    nu: optax.Updates
    mu_product: chex.Array  # U_{t}, float32 scalar


def scale_by_keras_nadam(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-7,
                         decay: float = 0.96) -> optax.GradientTransformation:
    def init_fn(params):
        return KerasNadamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
            mu_product=jnp.ones((), jnp.float32),
        )

    def update_fn(updates, state, params=None):
        del params
        step = (state.count + 1).astype(jnp.float32)  # local_step
        u_t = b1 * (1.0 - 0.5 * decay ** (0.004 * step))
        u_t1 = b1 * (1.0 - 0.5 * decay ** (0.004 * (step + 1.0)))
        mu_product = state.mu_product * u_t
        mu_product_next = mu_product * u_t1

        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g),
            state.nu, updates)
        beta2_power = b2 ** step

        def u(m, v, g):
            m_hat = (u_t1 * m / (1.0 - mu_product_next) +
                     (1.0 - u_t) * g / (1.0 - mu_product))
            v_hat = v / (1.0 - beta2_power)
            return m_hat / (jnp.sqrt(v_hat) + eps)

        new_updates = jax.tree_util.tree_map(u, mu, nu, updates)
        return new_updates, KerasNadamState(state.count + 1, mu, nu,
                                            mu_product)

    return optax.GradientTransformation(init_fn, update_fn)


def keras_nadam(learning_rate, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-7) -> optax.GradientTransformation:
    """tf.keras.optimizers.Nadam(learning_rate) equivalent."""
    return optax.chain(
        scale_by_keras_nadam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(learning_rate),
    )
