"""Multi-host feeding: disjoint per-process dataset shards, global-array
assembly via ``shard_batch_multihost`` on a REAL 2-process CPU run
(jax.distributed), and checkpoint epoch-resume metadata."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strajnet_tpu.parallel.mesh import create_mesh, shard_batch_multihost
from strajnet_tpu.train.checkpoints import CheckpointManager

tf = pytest.importorskip("tensorflow")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dataset_sharding_is_disjoint_and_complete(tmp_path):
    """make_train_dataset(shard_index/shard_count) feeds each process a
    disjoint partition of the records (the MirroredStrategy-distribution
    replacement, reference train.py:295-296)."""
    from strajnet_tpu.data.pipeline import make_train_dataset

    # tiny records: one float feature marking the record id
    path = tmp_path / "train"
    path.mkdir()
    n_records = 10
    fname = str(path / "00000.tfrecords")
    with tf.io.TFRecordWriter(fname) as w:
        for i in range(n_records):
            ex = tf.train.Example(features=tf.train.Features(feature={
                "rid": tf.train.Feature(
                    float_list=tf.train.FloatList(value=[float(i)]))}))
            w.write(ex.SerializeToString())

    def collect(shard_index, shard_count):
        ds = tf.data.TFRecordDataset([fname]).shard(shard_count, shard_index)
        ids = []
        for rec in ds:
            ex = tf.train.Example()
            ex.ParseFromString(rec.numpy())
            ids.append(int(ex.features.feature["rid"].float_list.value[0]))
        return set(ids)

    s0, s1 = collect(0, 2), collect(1, 2)
    assert s0.isdisjoint(s1)
    assert s0 | s1 == set(range(n_records))
    # and the real pipeline builder accepts the shard args
    ds = make_train_dataset(fname, batch_size=1, shard_index=0, shard_count=2)
    assert ds is not None


def test_shard_batch_multihost_single_process_equals_shard_batch():
    """At process_count()==1 the multihost placement is plain device_put on
    the 'data' axis — identical content + sharding to shard_batch."""
    from strajnet_tpu.parallel.mesh import shard_batch

    mesh = create_mesh(8, model_axis=2)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    a = shard_batch(batch, mesh)["x"]
    b = shard_batch_multihost(batch, mesh)["x"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.sharding == b.sharding


_WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=os.environ["COORD"],
        num_processes=2, process_id=int(os.environ["PID_IDX"]))
    import numpy as np
    import jax.numpy as jnp
    sys.path.insert(0, os.environ["REPO"])
    from strajnet_tpu.parallel.mesh import create_mesh, shard_batch_multihost

    pid = jax.process_index()
    assert jax.process_count() == 2
    mesh = create_mesh(model_axis=1)
    # each host contributes its own rows (as the sharded dataset would)
    local = {"x": np.full((2, 3), float(pid), np.float32)}
    with mesh:
        g = shard_batch_multihost(local, mesh)["x"]
        assert g.shape[0] == 4, g.shape  # global batch = 2 hosts x 2 rows
        total = float(jnp.sum(g))
    # rows from host 0 sum to 0, host 1 rows sum to 6 -> 6 total
    assert total == 6.0, total
    print(f"ok {pid}")
""")


@pytest.mark.slow
def test_two_process_cpu_global_batch_assembly(tmp_path):
    """Real jax.distributed 2-process CPU run: per-host local slices are
    assembled into one global 'data'-sharded array (the process_count>1
    branch of shard_batch_multihost)."""
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env_base = {k: v for k, v in os.environ.items()}
    env_base.update({"COORD": f"localhost:{port}", "REPO": REPO,
                     "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
                     "JAX_NUM_CPU_DEVICES": "1"})
    procs = []
    for pid in range(2):
        env = dict(env_base, PID_IDX=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"ok {pid}" in out


def test_checkpoint_epoch_metadata_roundtrip(tmp_path):
    """Resume bookkeeping: epoch/steps_per_epoch persist in the metrics
    sidecar and come back via metadata() (fixes the dead steps_per_epoch
    resume logic of round 1)."""
    from flax.training import train_state
    import optax

    params = {"w": jnp.ones((2, 2))}
    state = train_state.TrainState.create(
        apply_fn=lambda *a, **k: None, params=params,
        tx=optax.sgd(1e-2))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, state, metrics={"val_loss": 1.25, "epoch": 3,
                                "steps_per_epoch": 7})
    meta = mgr.metadata()
    assert meta["epoch"] == 3
    assert meta["steps_per_epoch"] == 7
    restored, step = mgr.restore(state)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.ones((2, 2)))
    # params-only restore (inference path): template-free, optimizer-agnostic
    params, step2 = mgr.restore_params()
    assert step2 == 7
    np.testing.assert_array_equal(np.asarray(params["w"]), np.ones((2, 2)))
    mgr.close()
