"""Multi-head attention with TF-Addons semantics, as a Flax module.

The reference uses ``tfa.layers.MultiHeadAttention`` throughout the trajectory
stack (reference trajNet.py:11,33,71,195,198). tfa's layer differs from the
usual "d_model" formulation:

- ``head_size`` and ``output_size`` are independent of the input dim;
- q/k/v projections are bias-free einsum kernels of shape [in, heads, head];
- the query is scaled by ``head_size ** -0.5``;
- an optional multiplicative {0,1} mask of shape [..., N_q, N_kv] is applied
  additively as ``logits += -1e10 * (1 - mask)``;
- only the output projection carries a bias.

This module reproduces those semantics exactly so trained-weight parity and
loss-curve parity are possible, while remaining a single fused-einsum program
that XLA maps cleanly onto the MXU.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class TfaMultiHeadAttention(nn.Module):
    num_heads: int
    head_size: int
    output_size: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jax.Array, key: jax.Array,
                 value: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        if value is None:
            value = key
        in_q = query.shape[-1]
        in_k = key.shape[-1]
        in_v = value.shape[-1]
        h, d = self.num_heads, self.head_size

        init = nn.initializers.glorot_uniform()
        wq = self.param("query_kernel", init, (h, in_q, d), jnp.float32)
        wk = self.param("key_kernel", init, (h, in_k, d), jnp.float32)
        wv = self.param("value_kernel", init, (h, in_v, d), jnp.float32)
        wo = self.param("projection_kernel", init, (h, d, self.output_size),
                        jnp.float32)
        bo = self.param("projection_bias", nn.initializers.zeros,
                        (self.output_size,), jnp.float32)

        dt = self.dtype
        q = jnp.einsum("...ni,hio->...nho", query.astype(dt), wq.astype(dt))
        k = jnp.einsum("...mi,hio->...mho", key.astype(dt), wk.astype(dt))
        v = jnp.einsum("...mi,hio->...mho", value.astype(dt), wv.astype(dt))

        q = q * jnp.asarray(d, dt) ** -0.5
        logits = jnp.einsum("...nho,...mho->...hnm", q, k)

        if mask is not None:
            mask = mask.astype(logits.dtype)
            if mask.ndim < logits.ndim:
                mask = jnp.expand_dims(mask, -3)
            logits = logits + jnp.asarray(-1e10, logits.dtype) * (1.0 - mask)

        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)
        if self.dropout > 0.0:
            attn = nn.Dropout(rate=self.dropout)(attn,
                                                 deterministic=deterministic)

        out = jnp.einsum("...hnm,...mho->...nho", attn, v)
        out = jnp.einsum("...nho,hoi->...ni", out, wo.astype(dt))
        return out + bo.astype(dt)
