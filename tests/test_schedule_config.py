"""LR-schedule parity vs the reference TF implementation + config text I/O."""

import numpy as np
import pytest

from strajnet_tpu.config import TaskConfig, WAYMO_TASK_CONFIG
from strajnet_tpu.objective.schedule import (
    cosine_decay_restarts,
    transformer_schedule,
)

REF_CONFIG_TEXT = """
num_past_steps: 10
num_future_steps: 80
num_waypoints: 8
cumulative_waypoints: false
normalize_sdc_yaw: true
grid_height_cells: 256
grid_width_cells: 256
sdc_y_in_grid: 192
sdc_x_in_grid: 128
pixels_per_meter: 3.2
agent_points_per_side_length: 48
agent_points_per_side_width: 16
"""


def test_task_config_from_reference_proto_text():
    cfg = TaskConfig.from_text(REF_CONFIG_TEXT)
    assert cfg == WAYMO_TASK_CONFIG
    # round trip
    assert TaskConfig.from_text(cfg.to_text()) == cfg


def test_cosine_decay_restarts_matches_reference():
    """Numerical parity with the reference's vendored SGDR schedule
    (lr_schedule.py:19-86), runnable directly in TF."""
    tf = pytest.importorskip("tensorflow")
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from lr_schedule import CosineDecayRestarts as RefSchedule
    finally:
        sys.path.remove("/root/reference")

    # training hyperparams (train.py:185-186)
    kwargs = dict(initial_learning_rate=1e-4,
                  first_decay_steps=int(30438 * 1.5), t_mul=1.25,
                  m_mul=0.99, alpha=0.0)
    ref = RefSchedule(**kwargs)
    ours = cosine_decay_restarts(**kwargs)
    steps = np.asarray([0, 1, 100, 30438, 45656, 45657, 100000, 456570],
                       np.float32)
    ref_vals = np.asarray([float(ref(s)) for s in steps])
    our_vals = np.asarray([float(ours(s)) for s in steps])
    np.testing.assert_allclose(our_vals, ref_vals, rtol=1e-5, atol=1e-10)


def test_transformer_schedule_shape():
    sch = transformer_schedule(384, warmup_steps=4000)
    vals = [float(sch(s)) for s in (1, 1000, 4000, 8000, 100000)]
    assert vals[1] < vals[2]  # warmup rising
    assert vals[3] < vals[2]  # decaying after warmup
    assert all(v > 0 for v in vals)
