"""End-to-end training-slice tests: jitted train step, convergence on a tiny
synthetic dataset, and mesh-sharded multi-device execution.

Uses ULTRA_TINY_MODEL_CONFIG — XLA-CPU compile time of the backward program
dominates these tests, so the config is as small as the code paths allow.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strajnet_tpu.config import (
    LossConfig,
    TaskConfig,
    ULTRA_TINY_MODEL_CONFIG,
    TrainConfig,
)
from strajnet_tpu.data.synthetic import synthetic_batch
from strajnet_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
from strajnet_tpu.train.state import create_train_state
from strajnet_tpu.train.step import make_eval_step, make_train_step

CFG = ULTRA_TINY_MODEL_CONFIG
TASK = TaskConfig(grid_height_cells=CFG.output_size[0],
                  grid_width_cells=CFG.output_size[1],
                  num_waypoints=CFG.num_waypoints)
TRAIN = TrainConfig(lr=3e-4, use_schedule=False)


@pytest.fixture(scope="module")
def state():
    return create_train_state(CFG, TRAIN)


@pytest.fixture(scope="module")
def train_step():
    return make_train_step(TASK, LossConfig(), CFG.num_waypoints,
                           donate=False)


def _jnp_batch(b, seed=0):
    return {k: jnp.asarray(v) for k, v in
            synthetic_batch(CFG, b, seed).items()}


@pytest.mark.parametrize("pallas", [None, "block"])
def test_jit_init_matches_eager_init(state, pallas):
    """create_train_state(jit_init=True) — the TPU default, one compiled
    init program (through the kernels-OFF twin model) instead of eager
    op-by-op — is bit-identical to eager init of the requested config
    (the module-scoped ``state`` fixture): threefry RNG folds per param
    PATH, so values are independent of both jit and the kernel mode."""
    import dataclasses
    cfg = dataclasses.replace(CFG, use_pallas_attention=pallas)
    jitted = create_train_state(cfg, TRAIN, jit_init=True)
    flat_a = jax.tree_util.tree_leaves_with_path(state.params)
    flat_b = jax.tree_util.tree_leaves_with_path(jitted.params)
    assert len(flat_a) == len(flat_b)
    for (pa, la), (pb, lb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=str(pa))


def test_train_step_runs_updates_and_converges(state, train_step):
    batch = _jnp_batch(2)
    new_state, losses = train_step(state, batch, jax.random.PRNGKey(0))
    assert int(new_state.step) == int(state.step) + 1
    for k in ("observed_xe", "occluded_xe", "flow", "flow_warp_xe", "total"):
        assert np.isfinite(float(losses[k])), k
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        state.params, new_state.params)
    assert max(jax.tree.leaves(diff)) > 0

    # fixed-batch convergence
    s = state
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(10):
        rng, sub = jax.random.split(rng)
        s, losses = train_step(s, batch, sub)
        if first is None:
            first = float(losses["total"])
    assert float(losses["total"]) < first


def test_eval_step_losses_and_metrics(state):
    estep = make_eval_step(TASK, LossConfig(), CFG.num_waypoints)
    losses, metrics = estep(state, _jnp_batch(2, seed=2))
    for k in ("vehicles_observed_auc", "vehicles_flow_epe",
              "vehicles_flow_warped_occupancy_auc"):
        assert np.isfinite(float(metrics[k])), k
    assert np.isfinite(float(losses["total"]))


def test_eval_step_compact_batch_matches_f32(state):
    """A compact-dtype batch (uint8 grids, f16 map — the pipeline's
    compact=True feed) produces the same losses/metrics as the f32 feed:
    ensure_f32 + the model's own raster casts make the paths identical."""
    estep = make_eval_step(TASK, LossConfig(), CFG.num_waypoints)
    full = _jnp_batch(2, seed=3)
    # binarize the grids so uint8 represents them exactly (the real
    # pipeline's grids are {0,1} by construction)
    for k in ("ogm", "gt_obs_ogm", "gt_occ_ogm"):
        full[k] = (full[k] > 0.5).astype(jnp.float32)
    compact = dict(full)
    for k in ("ogm", "gt_obs_ogm", "gt_occ_ogm"):
        compact[k] = full[k].astype(jnp.uint8)
    compact["map_image"] = full["map_image"].astype(jnp.float16)
    # f16 is exact only for the k/256 map values; synthetic maps aren't,
    # so reference losses are computed from the f16-rounded map.
    full["map_image"] = compact["map_image"].astype(jnp.float32)

    lf, mf = estep(state, full)
    lc, mc = estep(state, compact)
    for k in lf:
        np.testing.assert_allclose(float(lc[k]), float(lf[k]), rtol=1e-6, err_msg=k)
    for k in mf:
        np.testing.assert_allclose(float(mc[k]), float(mf[k]), rtol=1e-6, err_msg=k)


def test_accumulating_step_matches_per_step_losses(state, train_step):
    """accumulate=True returns running on-device loss sums identical to
    summing the per-step loss dicts (the no-host-sync training-loop path)."""
    from strajnet_tpu.data.pipeline import prefetch_to_mesh
    from strajnet_tpu.train.step import zero_loss_sums

    astep = make_train_step(TASK, LossConfig(), CFG.num_waypoints,
                            donate=False, accumulate=True)
    batches = [_jnp_batch(2, seed=s) for s in (0, 1)]

    s1, sums = state, zero_loss_sums()
    rng = jax.random.PRNGKey(5)
    expected = {k: 0.0 for k in sums}
    s2 = state
    for i, b in enumerate(batches):
        sub = jax.random.fold_in(rng, i)
        s1, sums = astep(s1, b, sub, sums)
        s2, losses = train_step(s2, b, sub)
        for k in expected:
            expected[k] += float(losses[k])
    for k in expected:
        assert float(sums[k]) == pytest.approx(expected[k], rel=1e-5), k
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        s1.params, s2.params)
    assert max(jax.tree.leaves(diff)) == 0.0

    # prefetch_to_mesh delivers the same batches, mesh-placed
    mesh = create_mesh(8, model_axis=4)  # data axis 2 matches batch 2
    got = list(prefetch_to_mesh(iter(batches), mesh))
    assert len(got) == 2
    np.testing.assert_array_equal(np.asarray(got[1]["ogm"]),
                                  np.asarray(batches[1]["ogm"]))


def test_multi_device_mesh_step(state, train_step):
    """DP x TP mixed sharding on the 8-device CPU mesh; loss matches the
    single-device program."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (conftest forces them)")
    estep = make_eval_step(TASK, LossConfig(), CFG.num_waypoints)
    batch = _jnp_batch(4, seed=3)
    l_single, _ = estep(state, batch)

    mesh = create_mesh(8, model_axis=2)
    with mesh:
        s = state.replace(params=shard_params(state.params, mesh))
        sharded = shard_batch(batch, mesh)
        new_state, losses = train_step(s, sharded, jax.random.PRNGKey(0))
        assert np.isfinite(float(losses["total"]))
        l_mesh, _ = estep(s, sharded)
    assert float(l_single["total"]) == pytest.approx(
        float(l_mesh["total"]), rel=1e-4)


@pytest.mark.slow
def test_training_improves_challenge_metrics():
    """~30 steps on a fixed synthetic set must measurably improve the
    CHALLENGE metrics (observed PR-AUC and Soft-IoU) from init — tying the
    loss implementation to the objective the reference is known for
    (ref occu_metric.py:26-140, leaderboard README.md:11-17), not just to
    its own loss value (which test_train_step_runs... already asserts)."""
    state = create_train_state(CFG, TrainConfig(lr=1e-3, use_schedule=False))
    step = make_train_step(TASK, LossConfig(), CFG.num_waypoints,
                           donate=False)
    estep = make_eval_step(TASK, LossConfig(), CFG.num_waypoints)
    batch = _jnp_batch(4, seed=3)

    def challenge_metrics(s):
        _, m = estep(s, batch)
        return (float(m["vehicles_observed_auc"]),
                float(m["vehicles_observed_iou"]))

    auc0, iou0 = challenge_metrics(state)
    s = state
    rng = jax.random.PRNGKey(2)
    for _ in range(30):
        rng, sub = jax.random.split(rng)
        s, losses = step(s, batch, sub)
    assert np.isfinite(float(losses["total"]))
    auc1, iou1 = challenge_metrics(s)
    assert auc1 > auc0, f"observed AUC did not improve: {auc0} -> {auc1}"
    assert iou1 > iou0, f"observed Soft-IoU did not improve: {iou0} -> {iou1}"
