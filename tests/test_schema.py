"""TFRecord schema round trip: encode_example -> parse_{train,test}_example."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from strajnet_tpu.data.schema import (  # noqa: E402
    SHAPES,
    encode_example,
    parse_test_example,
    parse_train_example,
)


def _fake_features(rng):
    f = {}
    f["centerlines"] = rng.randn(*SHAPES["centerlines"])
    f["actors"] = rng.randn(*SHAPES["actors"])
    f["occl_actors"] = rng.randn(*SHAPES["occl_actors"])
    f["ogm"] = rng.rand(*SHAPES["ogm"]) > 0.5
    f["map_image"] = rng.randint(-128, 128, SHAPES["map_image"])
    f["gt_obs_ogm"] = rng.rand(*SHAPES["gt_obs_ogm"]) > 0.8
    f["gt_occ_ogm"] = rng.rand(*SHAPES["gt_occ_ogm"]) > 0.9
    f["gt_flow"] = rng.randn(*SHAPES["gt_flow"]).astype(np.float32)
    f["origin_flow"] = rng.rand(*SHAPES["origin_flow"]).astype(np.float32)
    f["vec_flow"] = rng.randn(*SHAPES["vec_flow"]).astype(np.float32)
    return f


def test_train_roundtrip():
    rng = np.random.RandomState(0)
    feats = _fake_features(rng)
    record = encode_example(feats)
    parsed = parse_train_example(tf.constant(record))

    assert parsed["ogm"].shape == (512, 512, 11, 2)
    np.testing.assert_array_equal(parsed["ogm"].numpy(),
                                  feats["ogm"].astype(np.float32))
    # GT rasters center-cropped 512 -> 256 (train.py:93-99)
    assert parsed["gt_obs_ogm"].shape == (8, 256, 256, 1)
    np.testing.assert_array_equal(
        parsed["gt_obs_ogm"].numpy(),
        feats["gt_obs_ogm"][:, 128:384, 128:384].astype(np.float32))
    np.testing.assert_allclose(
        parsed["gt_flow"].numpy(),
        feats["gt_flow"][:, 128:384, 128:384], rtol=1e-6)
    # float64 -> float32 casts
    np.testing.assert_allclose(parsed["actors"].numpy(),
                               feats["actors"].astype(np.float32),
                               rtol=1e-6)
    # int8 image scaled by 1/256 (train.py:101)
    np.testing.assert_allclose(
        parsed["map_image"].numpy(),
        feats["map_image"].astype(np.int8).astype(np.float32) / 256,
        rtol=1e-6)


def test_test_roundtrip_with_scenario_id():
    rng = np.random.RandomState(1)
    feats = _fake_features(rng)
    record = encode_example(feats, scenario_id="scene-42", test=True)
    parsed = parse_test_example(tf.constant(record))
    assert parsed["scenario/id"].numpy() == b"scene-42"
    assert parsed["ogm"].shape == (512, 512, 11, 2)
    assert "gt_obs_ogm" not in parsed
