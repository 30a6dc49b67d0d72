"""TPU probe: bisect the attn/block-mode training worker crash.

Usage: python -u tools/probe_crash_bisect.py <part> [batch] [mode] [nblocks]
  part: enc | model | modelloss | gradout | sgd | step | stage0..2
    enc       encoder-only grad (all three branches + patch embeds)
    model     full model fwd+bwd, sum-of-outputs loss (no OGM loss)
    modelloss full model + OGM loss/warp kernel (no optimizer); the grad
              tree is reduced to a scalar INSIDE the program
    gradout   modelloss but the full gradient tree is a program OUTPUT
              (all grad buffers live at once, like the real step)
    sgd       gradout + a plain SGD update (new params as outputs; no
              Nadam moments, no donation)
    step      the real make_train_step (== tools/probe_train_tpu.py attn)
    stageN    grad through ``nblocks`` chained Swin blocks (alternating
              W-MSA / SW-MSA) at stage N's flagship geometry
  mode: attn (default) | block
Each part jits grad-wrt-params of a scalar loss. Inputs are passed as jit
ARGUMENTS, never closed over: closed-over concrete arrays lower as inline
stablehlo constants, and a 369 MB random OGM literal overflows the axon
remote-compile payload cap (HTTP 413) regardless of program size.
Run parts in separate processes — a worker crash kills the client.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

part = sys.argv[1]
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
mode = sys.argv[3] if len(sys.argv) > 3 else "attn"
nblocks = int(sys.argv[4]) if len(sys.argv) > 4 else 2

import dataclasses

from strajnet_tpu.config import STRAJNET_CONFIG

cfg = dataclasses.replace(STRAJNET_CONFIG, use_pallas_attention=mode)
print(f"backend={jax.default_backend()} part={part} batch={B} mode={mode}",
      flush=True)

dt = jnp.bfloat16


def gsum(g):
    return sum(jnp.sum(x.astype(jnp.float32) ** 2)
               for x in jax.tree_util.tree_leaves(g))


if part == "enc":
    from strajnet_tpu.models.swin import SwinTransformerEncoder
    import numpy as np

    enc = SwinTransformerEncoder(
        img_size=cfg.input_size, patch_size=(cfg.patch_size, cfg.patch_size),
        embed_dim=cfg.embed_dim, depths=cfg.depths, num_heads=cfg.num_heads,
        window_size=cfg.window_size, mlp_ratio=cfg.mlp_ratio,
        qkv_bias=cfg.qkv_bias, drop_rate=cfg.drop_rate,
        attn_drop_rate=cfg.attn_drop_rate,
        drop_path_rate=cfg.drop_path_rate, ape=cfg.ape,
        patch_norm=cfg.patch_norm, sep_encode=cfg.sep_encode,
        no_map=cfg.no_map, flow_sep=cfg.flow_sep, use_flow=cfg.use_flow,
        large_input=cfg.large_input,
        use_pallas=cfg.use_pallas_attention, dtype=dt)
    rng = np.random.RandomState(0)
    h, w = cfg.input_size
    mh, mw = cfg.map_size
    ogm = jnp.asarray(
        rng.rand(B, h, w, cfg.ogm_past_steps, cfg.ogm_classes) > 0.5,
        jnp.float32)
    flow = jnp.asarray(rng.randn(B, h, w, 2), jnp.float32)
    mp = jnp.asarray(rng.rand(B, mh, mw, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), ogm, mp, flow, True)

    @jax.jit
    def run(params, ogm, mp, flow):
        def loss(p):
            outs = enc.apply(p, ogm, mp, flow, False,
                             rngs={"dropout": jax.random.PRNGKey(1)})
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)
        return gsum(jax.grad(loss)(params))

    t0 = time.perf_counter()
    print("enc grad ok:", float(run(params, ogm, mp, flow)),
          f"{time.perf_counter()-t0:.1f}s", flush=True)

elif part == "step":
    import subprocess

    rc = subprocess.call([sys.executable, "-u",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)),
                          "probe_train_tpu.py"), "attn", str(B)])
    print("step rc:", rc, flush=True)
    sys.exit(rc)

elif part.startswith("stage"):
    from strajnet_tpu.models.swin import BasicLayer
    import numpy as np

    i = int(part[5:])
    dim = cfg.embed_dim * 2 ** i
    res = (cfg.input_size[0] // cfg.patch_size // 2 ** i,) * 2
    layer = BasicLayer(
        dim=dim, input_resolution=res, depth=nblocks,
        num_heads=cfg.num_heads[i], window_size=cfg.window_size,
        drop_path=(0.0,) * nblocks, downsample=False,
        use_pallas=mode, dtype=dt)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, res[0] * res[1], dim), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x, True)

    @jax.jit
    def run(params, x):
        def loss(p):
            out = layer.apply(p, x.astype(dt), True)
            out = out[0] if isinstance(out, (tuple, list)) else out
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return gsum(jax.grad(loss)(params))

    t0 = time.perf_counter()
    print(f"{part} x{nblocks} grad ok:", float(run(params, x)),
          f"{time.perf_counter()-t0:.1f}s", flush=True)

elif part in ("model", "modelloss", "gradout", "sgd"):
    from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs

    model = STrajNet(cfg=cfg)
    inputs = dummy_inputs(cfg, batch=B, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), **inputs)

    if part == "model":
        @jax.jit
        def run(params, inputs):
            def loss(p):
                y = model.apply(p, **dict(inputs, training=True),
                                rngs={"dropout": jax.random.PRNGKey(1)})
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return gsum(jax.grad(loss)(params))

        t0 = time.perf_counter()
        print("model grad ok:", float(run(params, inputs)),
              f"{time.perf_counter()-t0:.1f}s", flush=True)
    else:
        from strajnet_tpu.config import LossConfig, TaskConfig
        from strajnet_tpu.data.synthetic import synthetic_batch
        from strajnet_tpu.objective.loss import (OGMFlowLoss,
                                                 split_pred_waypoints,
                                                 true_waypoints_from_batch)

        task = TaskConfig(grid_height_cells=cfg.output_size[0],
                          grid_width_cells=cfg.output_size[1],
                          num_waypoints=cfg.num_waypoints)
        loss_fn = OGMFlowLoss(task, LossConfig())
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic_batch(cfg, B, seed=0).items()}

        def loss_of(p, batch):
            tw = true_waypoints_from_batch(batch)
            outputs = model.apply(
                p, ogm=batch["ogm"], map_img=batch["map_image"],
                obs=batch["actors"], occ=batch["occl_actors"],
                mapt=batch["centerlines"], flow=batch["vec_flow"],
                training=True, rngs={"dropout": jax.random.PRNGKey(1)})
            logits = split_pred_waypoints(outputs, cfg.num_waypoints)
            d = loss_fn(tw, logits)
            return (d["observed_xe"] + d["occluded_xe"] + d["flow"] +
                    d["flow_warp_xe"])

        if part == "modelloss":
            @jax.jit
            def run(params, batch):
                return gsum(jax.grad(loss_of)(params, batch))

            t0 = time.perf_counter()
            print("modelloss grad ok:", float(run(params, batch)),
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
        elif part == "gradout":
            # Full gradient tree as PROGRAM OUTPUTS: every grad buffer is
            # live at once (like the real step), no optimizer.
            @jax.jit
            def run(params, batch):
                return jax.grad(loss_of)(params, batch)

            t0 = time.perf_counter()
            g = run(params, batch)
            tot = float(gsum(g))
            print("gradout ok:", tot, f"{time.perf_counter()-t0:.1f}s",
                  flush=True)
        else:  # sgd: grads + plain SGD update, no Nadam moments, no donate
            @jax.jit
            def run(params, batch):
                g = jax.grad(loss_of)(params, batch)
                return jax.tree_util.tree_map(
                    lambda p, gg: p - 1e-4 * gg.astype(p.dtype), params, g)

            t0 = time.perf_counter()
            newp = run(params, batch)
            tot = float(gsum(newp))
            print("sgd ok:", tot, f"{time.perf_counter()-t0:.1f}s",
                  flush=True)
print("OK", flush=True)
