"""Full user-journey integration test (single slow pytest):

synthetic raw WOMD tf_example -> offline Processor -> TFRecords ->
training loop (2 steps + val epoch + checkpoint) -> inference ->
submission binproto -> wire-format parse-back.

Each stage is unit-tested elsewhere; this chains them exactly as the
README drives them (reference: data_preprocessing.py -> train.py ->
inference.py), so a break anywhere in the hand-off surfaces here.
"""

import glob
import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_preprocess import fake_scenario  # noqa: E402


def _encode_raw_womd(scenario) -> bytes:
    """Serialize a fake_scenario dict as a raw WOMD tf.Example covering the
    full features_description() spec (absent keys filled with zeros)."""
    from strajnet_tpu.data.womd import features_description

    spec = features_description()
    feats = {}
    for name, fl in spec.items():
        if name == "scenario/id":
            sid = scenario.get("scenario/id", "sc-0")
            feats[name] = tf.train.Feature(
                bytes_list=tf.train.BytesList(value=[sid.encode()]))
            continue
        if name in scenario:
            arr = np.asarray(scenario[name])
        else:
            arr = np.zeros(fl.shape, np.float32)
        flat = arr.reshape(-1)
        if fl.dtype == tf.int64:
            feats[name] = tf.train.Feature(int64_list=tf.train.Int64List(
                value=flat.astype(np.int64)))
        else:
            feats[name] = tf.train.Feature(float_list=tf.train.FloatList(
                value=flat.astype(np.float32)))
    ex = tf.train.Example(features=tf.train.Features(feature=feats))
    return ex.SerializeToString()


@pytest.mark.slow
def test_full_chain_preprocess_train_infer_submit(tmp_path):
    from strajnet_tpu.config import (
        STRAJNET_TRAIN_PY_CONFIG,
        TrainConfig,
    )
    from strajnet_tpu.data.preprocess import Processor
    from strajnet_tpu.infer.proto import iter_fields
    from strajnet_tpu.infer.runner import load_scenario_ids, run_shard
    from strajnet_tpu.infer.submission import submission_shard_filename
    from strajnet_tpu.train.checkpoints import CheckpointManager
    from strajnet_tpu.train.loop import train
    from strajnet_tpu.train.state import create_train_state
    from strajnet_tpu.train.step import make_predict_step

    # --- stage 1: raw tf_example shards (train + test), WOMD naming ---
    raw_dir = tmp_path / "tf_example"
    ids_dir = tmp_path / "ids"
    data_dir = tmp_path / "preprocessed_data"
    for d in (raw_dir, ids_dir, data_dir):
        d.mkdir()
    n_train, n_test = 8, 2
    train_raw = str(raw_dir / "training_tfexample.tfrecord-00000-of-00001")
    with tf.io.TFRecordWriter(train_raw) as w:
        for i in range(n_train):
            s = fake_scenario(seed=i)
            s["scenario/id"] = f"train-{i}"
            w.write(_encode_raw_womd(s))
    test_raw = str(raw_dir / "testing_tfexample.tfrecord-00000-of-00001")
    test_ids = [f"test-{i}" for i in range(n_test)]
    with tf.io.TFRecordWriter(test_raw) as w:
        for i, sid in enumerate(test_ids):
            s = fake_scenario(seed=10 + i)
            s["scenario/id"] = sid
            w.write(_encode_raw_womd(s))
    (ids_dir / "testing_scenario_ids.txt").write_text(
        "\n".join(test_ids) + "\n")
    (ids_dir / "validation_scenario_ids.txt").write_text("train-0\n")

    # --- stage 2: offline preprocessing -> framework TFRecords ---
    proc = Processor(save_dir=str(data_dir), ids_dir=str(ids_dir))
    assert proc.workflow(train_raw) == n_train
    assert proc.workflow(test_raw, pred=True) == n_test
    train_shard = str(data_dir / "train" / "00000new.tfrecords")
    test_shard = str(data_dir / "test" / "00000new.tfrecords")
    assert os.path.exists(train_shard) and os.path.exists(test_shard)
    # empty val split: the epoch-end val loop sees zero batches and skips
    # metrics (the val/metrics path has its own tests; compiling the full
    # jitted eval program on XLA-CPU would double this test's wall-clock)
    (data_dir / "val").mkdir()

    # --- stage 3: 2 training steps + checkpoint ---
    # STRAJNET_TRAIN_PY_CONFIG = the checked-in reference training variant
    # (fg_msa off) at the REAL 512^2 geometry the records carry, f32 for
    # XLA-CPU speed; batch 4 x 2 steps over the 8-device conftest mesh
    # (model_axis=2 -> data=4, same split the multichip dryrun proves).
    import dataclasses
    model_cfg = dataclasses.replace(STRAJNET_TRAIN_PY_CONFIG,
                                    dtype="float32")
    ckpt_dir = str(tmp_path / "ckpt")
    state = train(
        model_cfg=model_cfg,
        train_cfg=TrainConfig(batch_size=4, epochs=1, save_dir=ckpt_dir,
                              file_dir=str(data_dir), shuffle_buffer=8),
        model_axis=2)
    assert int(state.step) == 2
    assert os.path.exists(os.path.join(ckpt_dir, "train_log.csv"))

    # --- stage 4: inference from the saved checkpoint -> submission ---
    infer_state = create_train_state(model_cfg, TrainConfig())
    params, step = CheckpointManager(ckpt_dir).restore_params()
    assert params is not None and step == 2
    infer_state = infer_state.replace(
        params=jax.tree_util.tree_map(jnp.asarray, params))
    predict_step = make_predict_step(model_cfg.num_waypoints)
    ids = load_scenario_ids(str(ids_dir), test=True)
    sub_dir = str(tmp_path / "submission")
    assert run_shard(infer_state, predict_step, test_shard, ids,
                     sub_dir) == n_test

    # --- stage 5: parse the binproto back at the wire level ---
    sub_path = os.path.join(sub_dir, submission_shard_filename(test_shard))
    assert os.path.exists(sub_path)
    buf = open(sub_path, "rb").read()
    scenario_preds = [val for num, _, val in iter_fields(buf) if num == 7]
    assert len(scenario_preds) == n_test
    seen = set()
    for sp in scenario_preds:
        fields = list(iter_fields(sp))
        sid = fields[0][2].decode()
        seen.add(sid)
        waypoints = [v for num, _, v in fields if num == 2]
        assert len(waypoints) == STRAJNET_TRAIN_PY_CONFIG.num_waypoints
        for wp in waypoints:
            wp_fields = {num: v for num, _, v in iter_fields(wp)}
            # observed occupancy / occluded occupancy / flow bytes present
            assert set(wp_fields) == {1, 2, 3}
            assert all(len(v) > 0 for v in wp_fields.values())
    assert seen == set(test_ids)
