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


def test_compact_parse_bit_exact():
    """compact=True (uint8 grids, f16 map) widens back to the exact f32
    values of the default parse — the feed-shrink changes no numerics."""
    rng = np.random.RandomState(2)
    feats = _fake_features(rng)
    record = encode_example(feats)
    full = parse_train_example(tf.constant(record))
    compact = parse_train_example(tf.constant(record), compact=True)

    assert set(full) == set(compact)
    assert compact["ogm"].dtype == tf.uint8
    assert compact["gt_obs_ogm"].dtype == tf.uint8
    assert compact["map_image"].dtype == tf.float16
    assert compact["gt_flow"].dtype == tf.float32  # flows stay exact f32
    for k in full:
        np.testing.assert_array_equal(
            full[k].numpy(),
            compact[k].numpy().astype(np.float32),
            err_msg=k)


def test_train_step_accepts_compact_batch():
    """ensure_f32 makes the jitted step numerically identical under a
    compact-dtype batch (uint8 grids / f16 map)."""
    import jax.numpy as jnp

    from strajnet_tpu.train.step import ensure_f32

    batch = {
        "ogm": jnp.ones((1, 4, 4, 2, 2), jnp.uint8),
        "map_image": jnp.full((1, 2, 2, 3), 0.25, jnp.float16),
        "gt_obs_ogm": jnp.ones((1, 2, 2, 1), jnp.uint8),
        "gt_flow": jnp.ones((1, 2, 2, 2), jnp.float32),
        "none_field": None,
    }
    out = ensure_f32(batch)
    # model-input rasters pass through compact (the model casts them to
    # its compute dtype itself); loss/metrics inputs widen to f32
    assert out["ogm"] is batch["ogm"]
    assert out["map_image"] is batch["map_image"]
    assert out["gt_obs_ogm"].dtype == jnp.float32
    assert out["gt_flow"] is batch["gt_flow"]
    assert out["none_field"] is None


def test_test_roundtrip_with_scenario_id():
    rng = np.random.RandomState(1)
    feats = _fake_features(rng)
    record = encode_example(feats, scenario_id="scene-42", test=True)
    parsed = parse_test_example(tf.constant(record))
    assert parsed["scenario/id"].numpy() == b"scene-42"
    assert parsed["ogm"].shape == (512, 512, 11, 2)
    assert "gt_obs_ogm" not in parsed


def test_eval_dataset_tail_batch(tmp_path):
    """drop_remainder=False (the standalone eval CLI) keeps the ragged
    tail batch; True (the train loop's mesh-sharded val pass) drops it."""
    from strajnet_tpu.data.pipeline import as_numpy, make_eval_dataset

    rng = np.random.RandomState(1)
    path = str(tmp_path / "00000.tfrecords")
    with tf.io.TFRecordWriter(path) as w:
        for _ in range(3):
            w.write(encode_example(_fake_features(rng)))

    sizes = [b["ogm"].shape[0] for b in
             as_numpy(make_eval_dataset(path, 2, drop_remainder=False))]
    assert sizes == [2, 1]
    sizes = [b["ogm"].shape[0] for b in
             as_numpy(make_eval_dataset(path, 2))]
    assert sizes == [2]
