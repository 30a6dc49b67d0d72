"""On-TPU gradient cross-check: kernel-backward training default vs XLA.

VERDICT r4 #2: the batch-16 kernel-backward crash was resolved by a
placement change (batching the loss warps), and a placement-dependent fault
family that crashed at one layout could corrupt silently at a neighboring
one. This probe converts "doesn't crash" into "is correct": it computes the
FULL flagship gradient tree (value_and_grad of the training loss, exactly
train/step.py::_step_math's grad) from identical state/batch/rng under

  - mode "block": fused block kernels fwd+bwd + Pallas warp-gather loss
    warp (the shipped TPU training default), and
  - mode "none":  pure XLA (kernels off, XLA loss warp),

then compares per-leaf max relative error and the post-Nadam-step params.

Usage:
  python tools/probe_grad_parity_tpu.py run <mode> <batch> <out.npz>
  python tools/probe_grad_parity_tpu.py compare <a.npz> <b.npz> [rtol]

Each `run` is one process (one clean TPU client) so a crash in one
configuration cannot poison the other measurement; `compare` is pure numpy.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(mode_arg: str, batch: int, out_path: str):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from strajnet_tpu.config import (LossConfig, STRAJNET_CONFIG, TaskConfig,
                                     TrainConfig)
    from strajnet_tpu.data.synthetic import synthetic_batch
    from strajnet_tpu.objective.loss import (OGMFlowLoss,
                                             split_pred_waypoints,
                                             true_waypoints_from_batch)
    from strajnet_tpu.train.state import create_train_state
    from strajnet_tpu.train.step import ensure_f32

    mode = {"block": "block", "attn": "attn", "none": False}[mode_arg]
    # drop_path_rate=0: the kernel and XLA paths consume the dropout RNG
    # stream in different orders (per-block threaded masks vs in-module
    # draws), so with stochastic depth active the two modes compute
    # DIFFERENT functions and the comparison is meaningless. Zeroing it
    # makes both paths deterministic and bit-comparable while keeping the
    # full training program structure (training=True, full grad tree as
    # outputs — the bisect's crash trigger).
    cfg = dataclasses.replace(STRAJNET_CONFIG, use_pallas_attention=mode,
                              drop_path_rate=0.0)
    loss_cfg = LossConfig(warp_kernel=bool(mode))
    task = TaskConfig(grid_height_cells=cfg.output_size[0],
                      grid_width_cells=cfg.output_size[1],
                      num_waypoints=cfg.num_waypoints)

    # identical params across modes: the param tree is kernel-independent
    # (init never routes through Pallas) and create_train_state seeds
    # deterministically.
    state = create_train_state(cfg, TrainConfig(use_schedule=True))
    batch_d = {k: jnp.asarray(v)
               for k, v in synthetic_batch(cfg, batch, seed=0).items()}
    rng = jax.random.PRNGKey(0)
    loss_fn = OGMFlowLoss(task, loss_cfg)

    @jax.jit
    def grads_of(state, batch, rng):
        batch = ensure_f32(batch)
        true_waypoints = true_waypoints_from_batch(batch)

        def compute_loss(params):
            outputs = state.apply_fn(
                {"params": params}, ogm=batch["ogm"],
                map_img=batch["map_image"], obs=batch["actors"],
                occ=batch["occl_actors"], mapt=batch["centerlines"],
                flow=batch["vec_flow"], training=True,
                rngs={"dropout": rng})
            logits = split_pred_waypoints(outputs, cfg.num_waypoints)
            ld = loss_fn(true_waypoints, logits)
            return (ld["observed_xe"] + ld["occluded_xe"] + ld["flow"] +
                    ld["flow_warp_xe"])

        total, grads = jax.value_and_grad(compute_loss)(state.params)
        new_state = state.apply_gradients(grads=grads)
        return total, grads, new_state.params

    total, grads, new_params = grads_of(state, batch_d, rng)
    total = float(total)
    flat = {"__loss__": np.asarray(total, np.float64)}
    leaves = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, leaf in leaves:
        key = "g:" + "/".join(getattr(p, "key", str(p)) for p in path)
        flat[key] = np.asarray(leaf, np.float32)
    for path, leaf in jax.tree_util.tree_flatten_with_path(new_params)[0]:
        key = "p:" + "/".join(getattr(p, "key", str(p)) for p in path)
        flat[key] = np.asarray(leaf, np.float32)
    np.savez_compressed(out_path, **flat)
    print(f"mode={mode_arg} batch={batch} loss={total:.4f} "
          f"leaves={len(flat) - 1} -> {out_path}", flush=True)


# Gradient leaves that are MATHEMATICALLY ZERO: a constant bias added to
# every attention key shifts each logit by the same q.b, so softmax (and
# hence the loss) is invariant to it — autodiff computes it as a sum of
# large canceling terms, i.e. pure rounding noise, uncorrelated between
# formulations. Excluded from the pass/fail count (reported separately).
_ZERO_GRAD_LEAVES = ("g:fg_msa_layer/proj_k/bias",)


def compare(a_path: str, b_path: str, rtol: float = 1e-2):
    a, b = np.load(a_path), np.load(b_path)
    assert set(a.files) == set(b.files), "leaf sets differ"
    print(f"loss: {float(a['__loss__']):.6f} vs {float(b['__loss__']):.6f}")
    grads, n_bad = [], 0
    for k in sorted(a.files):
        if not k.startswith("g:"):
            # post-step params are not comparable on zero-init biases:
            # Nadam's /sqrt(v) normalization turns ANY sub-noise grad sign
            # flip into a full +/-lr update — judge the grads directly.
            continue
        va = a[k].astype(np.float64)
        vb = b[k].astype(np.float64)
        scale = max(np.abs(va).max(), np.abs(vb).max(), 1e-8)
        err = float(np.abs(va - vb).max() / scale)
        cos = float((va * vb).sum() /
                    max(np.linalg.norm(va) * np.linalg.norm(vb), 1e-30))
        grads.append((err, 1.0 - cos, k, float(scale)))
        if err > rtol and k not in _ZERO_GRAD_LEAVES:
            n_bad += 1
    grads.sort(reverse=True)
    errs = np.array([g[0] for g in grads])
    dcos = np.array([g[1] for g in grads])
    print(f"grad leaves: {len(grads)}; max-rel median {np.median(errs):.3e}"
          f" max {errs.max():.3e}; 1-cos median {np.median(dcos):.3e}"
          f" max {dcos.max():.3e}")
    print("worst 8 grad leaves:")
    for err, dc, k, scale in grads[:8]:
        zero = "  [math-zero grad: noise]" if k in _ZERO_GRAD_LEAVES else ""
        print(f"  maxrel {err:.3e}  1-cos {dc:.3e}  (scale {scale:.2e})"
              f"  {k}{zero}")
    print(f"grad leaves over rtol={rtol} (excl. math-zero): {n_bad}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    if sys.argv[1] == "run":
        run(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    else:
        raise SystemExit(compare(sys.argv[2], sys.argv[3],
                                 float(sys.argv[4])
                                 if len(sys.argv) > 4 else 1e-2))
