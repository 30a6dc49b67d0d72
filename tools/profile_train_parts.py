"""Training-step cost attribution on the flagship config (one chip).

Times each training-cost component separately so the gap between the
inference forward (~38 ms/batch16) and the full train step (~259 ms) can
be attributed: train-mode forward, model fwd+bwd, loss fwd+bwd (incl. the
warp-gather kernel backward), the bare OGM-loss forward, the Nadam update,
and the end-to-end step.

Usage: python -u tools/profile_train_parts.py [mode] [batch] [part ...]
  mode:  none | attn | block | block_fwd   (use_pallas_attention; default
         none — the training default while the kernel-backward worker
         crash is open, see models/strajnet.py)
  parts: fwd_train model_grad loss_grad loss_fwd warp_grad optim step
         enc_grad dec_grad   (default: the first six + step)

Timing pattern (memory: axon tunnel): block_until_ready is a no-op, so
every measurement syncs via a scalar host fetch. Small parts loop inside
one jitted fori_loop; the big fwd+bwd programs are timed as sequential
async dispatches with a data-dependent carry (the bench.py pattern —
wrapping them in fori exceeds the remote-compile payload cap). Inputs are
always jit ARGUMENTS, never closures (closed-over concrete arrays lower
as inline stablehlo constants and overflow the payload cap).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

from strajnet_tpu.config import (LossConfig, STRAJNET_CONFIG, TaskConfig,
                                 TrainConfig)

argv = sys.argv[1:]
mode_arg = argv[0] if argv else "none"
B = int(argv[1]) if len(argv) > 1 else 16
mode = {"attn": "attn", "block": "block",
        "block_fwd": "block_fwd", "none": False}[mode_arg]
_DEFAULT_PARTS = {"fwd_train", "model_grad", "loss_grad", "loss_fwd",
                  "warp_grad", "optim", "step"}
_KNOWN = _DEFAULT_PARTS | {"enc_grad", "dec_grad"}
PARTS = set(argv[2:]) or _DEFAULT_PARTS
_unknown = PARTS - _KNOWN
if _unknown:
    sys.exit(f"unknown part(s): {sorted(_unknown)}; choose from "
             f"{sorted(_KNOWN)}")

# STRAJNET_PROFILE_CONFIG=tiny: CPU smoke-testing of this script itself
# (the flagship geometry takes minutes per fwd+bwd on host). enc_grad /
# dec_grad hardcode flagship shapes — skip them under tiny.
if os.environ.get("STRAJNET_PROFILE_CONFIG") == "tiny":
    from strajnet_tpu.config import TINY_MODEL_CONFIG
    base_cfg = TINY_MODEL_CONFIG
    PARTS -= {"enc_grad", "dec_grad"}
else:
    base_cfg = STRAJNET_CONFIG
cfg = dataclasses.replace(base_cfg, use_pallas_attention=mode)
print(f"backend={jax.default_backend()} mode={mode_arg} batch={B}",
      flush=True)

from strajnet_tpu.data.synthetic import synthetic_batch
from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs
from strajnet_tpu.objective.loss import (OGMFlowLoss, split_pred_waypoints,
                                         true_waypoints_from_batch)
from strajnet_tpu.train.state import create_train_state

ITERS = int(os.environ.get("PROFILE_ITERS", "10"))
task = TaskConfig(grid_height_cells=cfg.output_size[0],
                  grid_width_cells=cfg.output_size[1],
                  num_waypoints=cfg.num_waypoints)
loss_fn = OGMFlowLoss(task, LossConfig())

model = STrajNet(cfg=cfg)
inputs = dummy_inputs(cfg, batch=B, dtype=jnp.float32)
params = model.init(jax.random.PRNGKey(0), **inputs)
batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, B, seed=0).items()}


def gsum(g):
    return sum(jnp.sum(x.astype(jnp.float32) ** 2)
               for x in jax.tree_util.tree_leaves(g))


def _cost(jfn, *args):
    """(flops, bytes accessed) of the compiled program, or (0, 0)."""
    try:
        ca = jfn.lower(*args).compile().cost_analysis()
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed",
                                                         0.0))
    except Exception:
        return 0.0, 0.0


def _report(name, ms, flops=0.0, bytes_=0.0):
    line = f"{name:12s}: {ms:8.2f} ms/batch{B}"
    if flops:
        tflops = flops / ms / 1e9
        gbs = bytes_ / ms / 1e6
        line += (f"  {flops/1e9:7.1f} GF {bytes_/1e9:6.2f} GB"
                 f"  -> {tflops:6.1f} TF/s ({tflops/197*100:4.1f}% MXU)"
                 f" {gbs:6.0f} GB/s ({gbs/819*100:4.1f}% HBM)")
    print(line, flush=True)


def time_seq(name, fn, *args):
    """Sequential async dispatches, scalar-carry data dependence."""
    if name not in PARTS:
        return
    jfn = jax.jit(fn)
    carry = jnp.float32(0)
    flops, bytes_ = _cost(jfn, carry, *args)
    carry = jfn(carry, *args)
    float(carry)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(ITERS):
        carry = jfn(carry, *args)
    float(carry)
    ms = (time.perf_counter() - t0) / ITERS * 1000
    _report(name, ms, flops, bytes_)


def time_fori(name, fn, *args):
    """fori_loop on device; falls back to sequential on compile failure
    (remote payload cap)."""
    if name not in PARTS:
        return

    @jax.jit
    def loop(n, *args):
        return jax.lax.fori_loop(
            0, n, lambda i, c: fn(c, *args), jnp.float32(0))

    try:
        float(loop(ITERS, *args))  # compile + sync
    except Exception as e:  # payload cap / lowering issue -> sequential
        print(f"{name}: fori fallback ({type(e).__name__})", flush=True)
        return time_seq(name, fn, *args)
    flops, bytes_ = _cost(jax.jit(fn), jnp.float32(0), *args)
    t0 = time.perf_counter()
    float(loop(ITERS, *args))
    ms = (time.perf_counter() - t0) / ITERS * 1000
    _report(name, ms, flops, bytes_)


# --- train-mode forward (dropout + droppath active) ---
def _fwd_train(carry, params, inputs):
    probed = dict(inputs)
    probed["flow"] = probed["flow"] + carry * 1e-30
    y = model.apply(params, **dict(probed, training=True),
                    rngs={"dropout": jax.random.PRNGKey(1)})
    return jnp.sum(y.astype(jnp.float32))


time_seq("fwd_train", _fwd_train, params, inputs)


# --- full-model fwd+bwd, sum-of-outputs loss (no OGM loss) ---
def _model_grad(carry, params, inputs):
    probed = dict(inputs)
    probed["flow"] = probed["flow"] + carry * 1e-30

    def loss(p):
        y = model.apply(p, **dict(probed, training=True),
                        rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(y.astype(jnp.float32) ** 2)

    return gsum(jax.grad(loss)(params))


time_seq("model_grad", _model_grad, params, inputs)

# --- loss fwd / fwd+bwd wrt logits (fixed model outputs) ---
outputs0 = jnp.zeros((B, cfg.output_size[0], cfg.output_size[1],
                      cfg.num_waypoints * 4), jnp.float32)
tw = true_waypoints_from_batch(batch)


def _loss_total(outputs, tw, keys):
    logits = split_pred_waypoints(outputs, cfg.num_waypoints)
    d = loss_fn(tw, logits)
    return sum(d[k] for k in keys)


ALL_KEYS = ("observed_xe", "occluded_xe", "flow", "flow_warp_xe")


def _loss_fwd(carry, outputs, tw):
    return _loss_total(outputs + carry * 1e-30, tw, ALL_KEYS)


def _loss_grad(carry, outputs, tw):
    g = jax.grad(_loss_total)(outputs + carry * 1e-30, tw, ALL_KEYS)
    return jnp.sum(g.astype(jnp.float32) ** 2)


def _warp_grad(carry, outputs, tw):
    g = jax.grad(_loss_total)(outputs + carry * 1e-30, tw,
                              ("flow_warp_xe",))
    return jnp.sum(g.astype(jnp.float32) ** 2)


time_fori("loss_fwd", _loss_fwd, outputs0, tw)
time_fori("loss_grad", _loss_grad, outputs0, tw)
time_fori("warp_grad", _warp_grad, outputs0, tw)

# --- optimizer update alone (Nadam on fixed grads) ---
if "optim" in PARTS:
    state = create_train_state(cfg, TrainConfig(use_schedule=True))
    grads0 = jax.tree.map(lambda x: jnp.full_like(x, 1e-6), state.params)

    def _optim(carry, state, grads):
        g = jax.tree.map(lambda x: x + carry * 1e-30, grads)
        new_state = state.apply_gradients(grads=g)
        return jnp.sum(jax.tree.leaves(new_state.params)[0]
                       .astype(jnp.float32))

    time_fori("optim", _optim, state, grads0)

# --- per-component grads ---
if "enc_grad" in PARTS:
    from strajnet_tpu.models.swin import SwinTransformerEncoder

    enc = SwinTransformerEncoder(
        img_size=cfg.input_size, patch_size=(cfg.patch_size, cfg.patch_size),
        embed_dim=cfg.embed_dim, depths=cfg.depths, num_heads=cfg.num_heads,
        window_size=cfg.window_size, mlp_ratio=cfg.mlp_ratio,
        qkv_bias=cfg.qkv_bias, drop_path_rate=cfg.drop_path_rate,
        sep_encode=cfg.sep_encode, no_map=cfg.no_map, flow_sep=cfg.flow_sep,
        use_flow=cfg.use_flow, large_input=cfg.large_input,
        use_pallas=mode, dtype=jnp.bfloat16)
    ep = {"params": params["params"]["encoder"]}

    def _enc_grad(carry, p, inputs):
        ogm = inputs["ogm"] + carry * 1e-30

        def loss(p):
            outs = enc.apply(p, ogm, inputs["map_img"], inputs["flow"],
                             False, rngs={"dropout": jax.random.PRNGKey(1)})
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

        return gsum(jax.grad(loss)(p))

    time_seq("enc_grad", _enc_grad, ep, inputs)

if "dec_grad" in PARTS:
    from strajnet_tpu.models.decoder import Pyramid3DDecoder

    dec = Pyramid3DDecoder(shallow_decode=1, bottleneck_size=(16, 16),
                           dtype=jnp.bfloat16)
    dp = {"params": params["params"]["decoder"]}
    res_shapes = [(B, 64 * 64, 96), (B, 64 * 64, 96), (B, 32 * 32, 192),
                  (B, 16 * 16, 384)]
    dx = jnp.zeros((B, 8, 16, 16, 384), jnp.bfloat16)
    dres = [jnp.zeros(s, jnp.bfloat16) for s in res_shapes]

    def _dec_grad(carry, p, x, res):
        x = x + (carry * 1e-30).astype(x.dtype)

        def loss(p):
            y = dec.apply(p, x, res)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        return gsum(jax.grad(loss)(p))

    time_seq("dec_grad", _dec_grad, dp, dx, dres)

# --- the real end-to-end step (donate off: state reuse across timing) ---
if "step" in PARTS:
    from strajnet_tpu.train.step import make_train_step, zero_loss_sums

    state = create_train_state(cfg, TrainConfig(use_schedule=True))
    step = make_train_step(task, LossConfig(), cfg.num_waypoints,
                           donate=True, accumulate=True)
    rng = jax.random.PRNGKey(0)
    flops, bytes_ = _cost(step, state, batch, rng, zero_loss_sums())
    st, sm = step(state, batch, rng, zero_loss_sums())
    float(sm["total"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        st, sm = step(st, batch, rng, sm)
    float(sm["total"])
    ms = (time.perf_counter() - t0) / ITERS * 1000
    _report("step", ms, flops, bytes_)

print("OK", flush=True)
