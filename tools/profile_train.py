"""Training-step throughput on the full config (one chip).

NOTE: block_until_ready is a no-op through the axon tunnel — always
synchronize with a host fetch (float()) before starting timers.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from strajnet_tpu.config import (LossConfig, STRAJNET_CONFIG, TrainConfig,
                                 WAYMO_TASK_CONFIG)
from strajnet_tpu.data.synthetic import synthetic_batch
from strajnet_tpu.train.state import create_train_state
from strajnet_tpu.train.step import make_train_step

B = 8
cfg = STRAJNET_CONFIG
state = create_train_state(cfg, TrainConfig())
step = make_train_step(WAYMO_TASK_CONFIG, LossConfig(), cfg.num_waypoints,
                       donate=False)
batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, B).items()}

@jax.jit
def loop(state, batch, rng, n):
    def body(i, carry):
        st, r = carry
        r, sub = jax.random.split(r)
        st, losses = step.__wrapped__(st, batch, sub)
        return (st, r)
    return jax.lax.fori_loop(0, n, body, (state, rng))

def sync(out):
    return float(jnp.sum(jax.tree.leaves(out[0].params)[0].astype(jnp.float32)))

N = 10
sync(loop(state, batch, jax.random.PRNGKey(0), 2))  # compile + warm, fully synced
t0 = time.perf_counter()
sync(loop(state, batch, jax.random.PRNGKey(0), N))
dt = time.perf_counter() - t0
print(f"train: {dt/N*1000:.1f} ms/step (batch {B}) = "
      f"{B*N/dt:.1f} scenes/s/chip")
