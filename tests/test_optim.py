"""Golden parity of keras_nadam vs tf.keras.optimizers.Nadam: identical
parameter trajectories over multiple steps (incl. the momentum-cache
schedule that optax.nadam omits)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strajnet_tpu.train.optim import keras_nadam

tf = pytest.importorskip("tensorflow")


def test_keras_nadam_trajectory_matches_tf():
    """vs tf_keras.optimizers.legacy.Nadam — the optimizer_v2 implementation
    TF shipped in the reference's era (2022, TF<=2.10), whose momentum-decay
    exponent is 0.96**(0.004*t). (Keras >=2.11 changed the exponent to
    0.96**t; the reference predates that.)"""
    tf_keras = pytest.importorskip("tf_keras")
    rng = np.random.RandomState(0)
    w0 = rng.randn(5, 3).astype(np.float32)
    grads = [rng.randn(5, 3).astype(np.float32) * 0.5 for _ in range(12)]
    lr = 1e-2

    var = tf.Variable(w0)
    opt = tf_keras.optimizers.legacy.Nadam(learning_rate=lr, beta_1=0.9,
                                           beta_2=0.999, epsilon=1e-7)
    tf_traj = []
    for g in grads:
        opt.apply_gradients([(tf.constant(g), var)])
        tf_traj.append(var.numpy().copy())

    tx = keras_nadam(lr)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for i, g in enumerate(grads):
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = params + updates
        np.testing.assert_allclose(np.asarray(params), tf_traj[i],
                                   rtol=2e-5, atol=2e-6,
                                   err_msg=f"step {i}")


def test_keras_nadam_differs_from_optax_nadam():
    """Sanity: the momentum-cache schedule is a real (small) difference."""
    import optax

    w0 = jnp.ones((4,))
    g = jnp.full((4,), 0.3)
    tx1, tx2 = keras_nadam(1e-2), optax.nadam(1e-2, eps=1e-7)
    p1, s1 = w0, tx1.init(w0)
    p2, s2 = w0, tx2.init(w0)
    for _ in range(5):
        u1, s1 = tx1.update(g, s1, p1)
        p1 = p1 + u1
        u2, s2 = tx2.update(g, s2, p2)
        p2 = p2 + u2
    assert not np.allclose(np.asarray(p1), np.asarray(p2), atol=1e-7)
    # but they are close — same family
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=5e-2)
