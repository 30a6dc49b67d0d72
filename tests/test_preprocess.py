"""Offline preprocessing tests on a synthetic WOMD scenario.

Builds a fake scenario with a few moving box agents and checks geometric
invariants of the rasterizer (SDC-centered occupancy, backward-flow warp
consistency) plus the end-to-end Processor -> TFRecord -> parser loop.
"""

import numpy as np
import pytest

from strajnet_tpu.config import TaskConfig, WAYMO_TASK_CONFIG
from strajnet_tpu.data import raster
from strajnet_tpu.data.vectorize import (
    rotate_all_from_inputs,
    segment_centerlines,
    select_actors,
)
from strajnet_tpu.data.womd import (
    NUM_AGENTS,
    NUM_FUTURE_STEPS,
    NUM_PAST_STEPS,
    NUM_ROADGRAPH_SAMPLES,
    TYPE_VEHICLE,
)

# Small grid config so the scatter tests run fast.
CFG = TaskConfig(grid_height_cells=64, grid_width_cells=64,
                 sdc_x_in_grid=32, sdc_y_in_grid=48,
                 pixels_per_meter=3.2,
                 agent_points_per_side_length=12,
                 agent_points_per_side_width=4)


def fake_scenario(n_agents=3, speed=1.0, seed=0):
    """SDC at origin facing +y after normalization; vehicles moving +x."""
    rng = np.random.RandomState(seed)
    S = {}

    def state(field, value):
        S[f"state/{field}"] = value

    past, fut = NUM_PAST_STEPS, NUM_FUTURE_STEPS
    x0 = np.zeros(NUM_AGENTS)
    y0 = np.zeros(NUM_AGENTS)
    x0[1:n_agents + 1] = rng.uniform(-5, 5, n_agents)
    y0[1:n_agents + 1] = rng.uniform(-5, 5, n_agents)

    def traj(time, steps, t0):
        # agents move along +x at `speed` m/s; 0.1s per step
        ts = t0 + np.arange(steps)
        x = x0[:, None] + speed * 0.1 * ts[None, :]
        y = np.broadcast_to(y0[:, None], (NUM_AGENTS, steps)).copy()
        return x, y

    for time, steps, t0 in (("past", past, 0), ("current", 1, past),
                            ("future", fut, past + 1)):
        x, y = traj(time, steps, t0)
        state(f"{time}/x", x.astype(np.float32))
        state(f"{time}/y", y.astype(np.float32))
        state(f"{time}/z", np.zeros((NUM_AGENTS, steps), np.float32))
        state(f"{time}/bbox_yaw",
              np.zeros((NUM_AGENTS, steps), np.float32))
        state(f"{time}/length",
              np.full((NUM_AGENTS, steps), 4.0, np.float32))
        state(f"{time}/width",
              np.full((NUM_AGENTS, steps), 2.0, np.float32))
        state(f"{time}/velocity_x",
              np.full((NUM_AGENTS, steps), speed, np.float32))
        state(f"{time}/velocity_y",
              np.zeros((NUM_AGENTS, steps), np.float32))
        valid = np.zeros((NUM_AGENTS, steps), np.int64)
        valid[:n_agents + 1] = 1
        state(f"{time}/valid", valid)

    is_sdc = np.zeros(NUM_AGENTS, np.int64)
    is_sdc[0] = 1
    state("is_sdc", is_sdc)
    types = np.zeros(NUM_AGENTS, np.float32)
    types[:n_agents + 1] = TYPE_VEHICLE
    state("type", types)
    # SDC faces +x (yaw 0) -> normalization rotates world by +pi/2.
    S["state/current/bbox_yaw"][:] = 0.0

    S["roadgraph_samples/xyz"] = np.zeros((NUM_ROADGRAPH_SAMPLES, 3),
                                          np.float32)
    S["roadgraph_samples/dir"] = np.zeros((NUM_ROADGRAPH_SAMPLES, 3),
                                          np.float32)
    S["roadgraph_samples/id"] = np.zeros((NUM_ROADGRAPH_SAMPLES, 1),
                                         np.int64)
    S["roadgraph_samples/type"] = np.zeros((NUM_ROADGRAPH_SAMPLES, 1),
                                           np.int64)
    S["roadgraph_samples/valid"] = np.zeros((NUM_ROADGRAPH_SAMPLES, 1),
                                            np.int64)
    # one straight lane: 20 points along +x world
    S["roadgraph_samples/xyz"][:20, 0] = np.arange(20) * 2.0
    S["roadgraph_samples/id"][:20, 0] = 7
    S["roadgraph_samples/type"][:20, 0] = 1
    S["roadgraph_samples/valid"][:20, 0] = 1

    for time, steps in (("current", 1), ("past", NUM_PAST_STEPS)):
        S[f"traffic_light_state/{time}/state"] = np.zeros((steps, 16),
                                                          np.int64)
        S[f"traffic_light_state/{time}/valid"] = np.zeros((steps, 16),
                                                          np.int64)
        for f in ("x", "y", "z"):
            S[f"traffic_light_state/{time}/{f}"] = np.zeros((steps, 16),
                                                            np.float32)
    return S


def test_current_occupancy_covers_sdc():
    s = fake_scenario()
    occ = raster.render_occupancy(s, ["current"], CFG)
    grid = np.asarray(occ[TYPE_VEHICLE])[0]
    assert grid.shape == (64, 64)
    # The SDC's own box covers the SDC grid cell.
    assert grid[CFG.sdc_y_in_grid, CFG.sdc_x_in_grid] == 1.0
    assert grid.sum() > 4  # several boxes rendered
    assert grid.max() == 1.0  # clipped


def test_occupancy_moves_with_agents():
    """World +x becomes image 'up' (-y) after pi/2-yaw normalization."""
    s = fake_scenario(speed=5.0)
    occ = raster.render_occupancy(s, ["past", "current", "future"], CFG)
    grid = np.asarray(occ[TYPE_VEHICLE])
    ys_early = np.where(grid[0].sum(axis=1) > 0)[0]
    ys_late = np.where(grid[30].sum(axis=1) > 0)[0]
    assert ys_early.size > 0 and ys_late.size > 0
    assert ys_late.mean() < ys_early.mean()  # moved up the image


def test_backward_flow_points_backwards():
    s = fake_scenario(speed=5.0)
    flow = raster.render_backward_flow(
        s, ["past", "current", "future"], CFG, waypoint_size=10)
    f = np.asarray(flow[TYPE_VEHICLE])[20]  # some future step
    nz = np.abs(f).sum(axis=-1) > 0
    assert nz.sum() > 0
    # motion +x world = -y image; backward flow dy = earlier - later > 0.
    dys = f[..., 1][nz]
    assert dys.mean() > 0
    # 5 m/s * 1 s * 3.2 px/m = 16 px displacement
    assert abs(dys.mean() - 16) < 2


def test_waypoint_grids_shapes_and_consistency():
    s = fake_scenario(speed=2.0)
    grids = raster.create_timestep_grids(s, CFG, with_future=True)
    wp = raster.create_waypoint_grids(grids, CFG, TYPE_VEHICLE)
    t = CFG.num_waypoints
    assert np.asarray(wp.observed_occupancy).shape == (t, 64, 64, 1)
    assert np.asarray(wp.flow).shape == (t, 64, 64, 2)
    # flow-origin of waypoint 0 == all-agent occupancy at current time
    np.testing.assert_array_equal(
        np.asarray(wp.flow_origin_occupancy)[0, ..., 0],
        np.asarray(grids.all_occupancy[TYPE_VEHICLE])[NUM_PAST_STEPS])
    # warping origin by GT flow must overlap the waypoint occupancy
    from strajnet_tpu.core.sampling import flow_warp_origin
    import jax.numpy as jnp
    warped = np.asarray(flow_warp_origin(
        jnp.asarray(wp.flow_origin_occupancy[0:1]),
        jnp.asarray(wp.flow[0:1])))
    obs = np.asarray(wp.observed_occupancy)[0]
    inter = (warped[0, ..., 0] * obs[..., 0]).sum()
    assert inter / max(obs.sum(), 1) > 0.5


def test_observed_rule_sensitivity():
    """Pins the observed/occluded split to 'valid at ANY history step'
    (the challenge definition + public renderer rule — see
    raster._observation_mask) and quantifies what the plausible alternative
    ('valid at the CURRENT step only') would do to the occluded channel.

    Agent 2 is made valid in the early past but invalid at the current step
    while existing in the future: under the correct rule it is OBSERVED
    (seen in an input frame); under the alternative it would be occluded.
    """
    import jax.numpy as jnp

    from strajnet_tpu.objective.pr_auc import pr_auc

    s = fake_scenario(n_agents=3)
    # agent 2: drop out of view from past step 5 onward (incl. current)
    s["state/past/valid"] = s["state/past/valid"].copy()
    s["state/current/valid"] = s["state/current/valid"].copy()
    s["state/past/valid"][2, 5:] = 0
    s["state/current/valid"][2, :] = 0

    occl = raster.render_occupancy(s, ["future"], CFG,
                                   include_observed=False,
                                   include_occluded=True)
    obs = raster.render_occupancy(s, ["future"], CFG,
                                  include_observed=True,
                                  include_occluded=False)
    occl_grid = np.asarray(occl[TYPE_VEHICLE])
    obs_grid = np.asarray(obs[TYPE_VEHICLE])

    # ours: agent 2 was seen in an input frame -> observed, NOT occluded
    assert occl_grid.sum() == 0.0
    assert obs_grid.sum() > 0

    # the alternative rule: current-step validity only
    cur_valid = s["state/current/valid"][:, 0] > 0
    alt_mask = np.logical_not(cur_valid)[:, None]

    # replicate the renderer with the alternative filter by zeroing the
    # current-valid agents' future validity
    s_alt = dict(s)
    s_alt["state/future/valid"] = (s["state/future/valid"] *
                                   alt_mask.astype(np.int64))
    occl_alt = np.asarray(raster.render_occupancy(
        s_alt, ["future"], CFG)[TYPE_VEHICLE])
    assert occl_alt.sum() > 0  # agent 2's future lands in occluded there

    # metric sensitivity: the two rules give entirely DISJOINT occluded
    # channels for this scene, so leaderboard metric #3 (occluded AUC)
    # depends wholly on this choice. A model trained on our GT scored
    # against the alternative GT collapses to the base rate (the PR-AUC of
    # an all-negative prediction under Keras's first-threshold convention).
    assert (occl_alt * occl_grid).sum() == 0.0  # zero overlap
    base_rate = occl_alt.mean()
    auc_alt_vs_ours = float(pr_auc(jnp.asarray(occl_alt[..., None]),
                                   jnp.asarray(occl_grid[..., None])))
    assert auc_alt_vs_ours == pytest.approx(base_rate, rel=1e-3)
    assert auc_alt_vs_ours < 0.05  # vs 1.0 for matching rules


def test_rotate_and_select_actors():
    s = fake_scenario(n_agents=3)
    rot = rotate_all_from_inputs(s, CFG)
    actors, occl = select_actors(rot, s["state/type"], max_actors=8,
                                 max_occu=4)
    assert actors.shape == (8, 11, 8)
    assert occl.shape == (4, 11, 8)
    # 4 valid agents (SDC + 3) -> 4 nonzero actor slots, type one-hot veh
    nonzero = np.abs(actors).sum(axis=(1, 2)) > 0
    assert nonzero.sum() == 4
    assert actors[0, 0, 5] == 1.0  # vehicle one-hot at feature 5


def test_segment_centerlines():
    s = fake_scenario()
    rot = rotate_all_from_inputs(s, CFG)
    segs = segment_centerlines(rot, s["roadgraph_samples/type"],
                               s["roadgraph_samples/id"], num_segs=16)
    assert segs.shape == (16, 10, 7)
    assert np.abs(segs[:2]).sum() > 0  # 20 points -> 2 segments
    np.testing.assert_array_equal(segs[0, 0, 4:], [1, 0, 0])  # lane one-hot


@pytest.mark.slow
def test_processor_end_to_end(tmp_path):
    """Full Processor on a synthetic scenario at real 512/256 geometry."""
    tf = pytest.importorskip("tensorflow")
    from strajnet_tpu.data.preprocess import Processor
    from strajnet_tpu.data.schema import parse_train_example

    s = fake_scenario()
    proc = Processor(save_dir=str(tmp_path))
    feats = proc.process_scenario(s, with_future=True)
    assert feats["ogm"].shape == (512, 512, 11, 2)
    assert feats["map_image"].shape == (256, 256, 3)
    assert feats["gt_obs_ogm"].shape == (8, 512, 512, 1)
    assert feats["vec_flow"].shape == (512, 512, 2)
    assert feats["actors"].shape == (48, 11, 8)
    assert feats["centerlines"].shape == (256, 10, 7)

    from strajnet_tpu.data.schema import encode_example
    record = encode_example(feats)
    parsed = parse_train_example(tf.constant(record))
    assert parsed["ogm"].shape == (512, 512, 11, 2)
    assert float(parsed["ogm"].numpy().sum()) > 0
    assert parsed["gt_obs_ogm"].shape == (8, 256, 256, 1)
