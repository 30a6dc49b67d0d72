"""Train state + optimizer.

Optimizer parity: Keras Nadam(lr) with defaults beta_1=0.9, beta_2=0.999,
epsilon=1e-7 (reference train.py:197) — implemented EXACTLY (incl. the
legacy-Keras momentum-cache schedule) by
:func:`strajnet_tpu.train.optim.keras_nadam`, golden-tested against
``tf_keras.optimizers.legacy.Nadam`` in tests/test_optim.py. The reference
constructs an SGDR cosine-restarts schedule but never wires it
(train.py:185-186); here ``TrainConfig.use_schedule`` wires it by default.
"""

from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from strajnet_tpu.config import ModelConfig, TrainConfig
from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs
from strajnet_tpu.objective.schedule import cosine_decay_restarts
from strajnet_tpu.train.optim import keras_nadam


class TrainState(train_state.TrainState):
    """Standard flax TrainState; ``apply_fn`` is the STrajNet apply."""


def make_optimizer(train_cfg: TrainConfig) -> optax.GradientTransformation:
    if train_cfg.use_schedule:
        lr = cosine_decay_restarts(
            train_cfg.lr, train_cfg.first_decay_steps,
            t_mul=train_cfg.t_mul, m_mul=train_cfg.m_mul,
            alpha=train_cfg.alpha)
    else:
        lr = train_cfg.lr
    tx = keras_nadam(lr, b1=0.9, b2=0.999, eps=1e-7)
    if train_cfg.grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(train_cfg.grad_clip_norm),
                         tx)
    return tx


def create_train_state(model_cfg: ModelConfig, train_cfg: TrainConfig,
                       rng: Optional[jax.Array] = None,
                       jit_init: Optional[bool] = None) -> TrainState:
    """``jit_init`` compiles the whole flax init into ONE program instead of
    dispatching thousands of tiny eager ops. Through a remote-device client
    (axon tunnel) eager init is RTT-bound at minutes per flagship model;
    the jitted program is seconds warm (and persists in the compilation
    cache). Default: auto — jit on TPU, eager elsewhere (XLA-CPU compile of
    the flagship init program would itself take minutes, e.g. in the
    virtual-mesh dry run). Results are bit-identical either way (threefry
    RNG is deterministic under jit)."""
    if rng is None:
        rng = jax.random.PRNGKey(train_cfg.seed)
    model = STrajNet(cfg=model_cfg)
    inputs = dummy_inputs(model_cfg, batch=1)
    if jit_init is None:
        jit_init = jax.default_backend() == "tpu"
    if jit_init:
        # Init through the kernels-OFF twin: the param tree is identical
        # (flax param values depend only on the param path and the root
        # rng, and the Pallas paths declare exactly the XLA modules'
        # params), so every kernel-mode/strip-width variant shares ONE
        # cached init program.
        import dataclasses
        init_model = STrajNet(cfg=dataclasses.replace(
            model_cfg, use_pallas_attention=False))
        variables = jax.jit(
            lambda r, kw: init_model.init(r, **kw))(rng, inputs)
    else:
        variables = model.init(rng, **inputs)
    return TrainState.create(apply_fn=model.apply,
                             params=variables["params"],
                             tx=make_optimizer(train_cfg))
