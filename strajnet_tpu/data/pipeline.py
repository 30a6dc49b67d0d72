"""Host-side input pipeline: TFRecords -> device-ready numpy batches.

Parity target: the tf.data wiring in reference train.py:378-389 and
inference.py:254-259, upgraded for TPU feeding:

- per-host file sharding (``shard_index``/``shard_count``) replaces
  MirroredStrategy's dataset distribution (train.py:295-296);
- a real shuffle buffer (the reference uses 64 samples, train.py:381);
- parallel map + prefetch; batches are delivered as numpy so the training
  loop can ``jax.device_put`` them onto the mesh.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from strajnet_tpu.data.schema import parse_test_example, parse_train_example


def _tf():
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    return tf


def make_train_dataset(file_pattern: str, batch_size: int,
                       shuffle_buffer: int = 2048,
                       shard_index: int = 0, shard_count: int = 1,
                       seed: Optional[int] = None,
                       repeat: bool = False, compact: bool = False):
    tf = _tf()
    files = tf.io.matching_files(file_pattern)
    ds = tf.data.TFRecordDataset(files, compression_type="",
                                 num_parallel_reads=tf.data.AUTOTUNE)
    if shard_count > 1:
        ds = ds.shard(shard_count, shard_index)
    if repeat:
        ds = ds.repeat()
    ds = ds.shuffle(shuffle_buffer, seed=seed, reshuffle_each_iteration=True)
    ds = ds.map(lambda ex: parse_train_example(ex, compact=compact),
                num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(batch_size, drop_remainder=True)
    ds = ds.prefetch(tf.data.AUTOTUNE)
    return ds


def make_eval_dataset(file_pattern: str, batch_size: int,
                      shard_index: int = 0, shard_count: int = 1,
                      compact: bool = False, drop_remainder: bool = True):
    """``drop_remainder``: the training loop's val pass keeps it True (its
    batches shard onto the device mesh, so every batch must divide the
    'data' axis); the standalone eval CLI passes False so the final
    partial batch is still evaluated (the jitted eval step just compiles
    one extra shape) instead of silently skipping up to batch_size-1
    trailing records of the split."""
    tf = _tf()
    files = tf.io.matching_files(file_pattern)
    ds = tf.data.TFRecordDataset(files, compression_type="",
                                 num_parallel_reads=tf.data.AUTOTUNE)
    if shard_count > 1:
        ds = ds.shard(shard_count, shard_index)
    ds = ds.map(lambda ex: parse_train_example(ex, compact=compact),
                num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(batch_size, drop_remainder=drop_remainder)
    ds = ds.prefetch(tf.data.AUTOTUNE)
    return ds


def make_test_dataset(shard_path: str, batch_size: int = 1,
                      compact: bool = False):
    """One shard of the test split incl. scenario ids (inference.py:254-259)."""
    tf = _tf()
    ds = tf.data.TFRecordDataset(shard_path)
    ds = ds.map(lambda ex: parse_test_example(ex, compact=compact),
                num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(batch_size)
    ds = ds.prefetch(tf.data.AUTOTUNE)
    return ds


def as_numpy(dataset) -> Iterator[dict]:
    for batch in dataset:
        yield {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
               for k, v in batch.items()}


def prefetch_to_mesh(iterator: Iterator[dict], mesh, size: int = 2,
                     multihost: bool = False) -> Iterator[dict]:
    """Overlaps host->device transfer with device compute.

    Pulls batches from ``iterator`` on a background thread and places them on
    the mesh (``shard_batch`` / ``shard_batch_multihost``) ``size`` batches
    ahead of the consumer, so the H2D copy of batch N+1 rides under the
    compute of batch N instead of serializing with it (the prefetch the
    reference gets for free from ``strategy.experimental_distribute_dataset``,
    train.py:295-296).
    """
    import queue
    import threading

    from strajnet_tpu.parallel.mesh import shard_batch, shard_batch_multihost

    place = shard_batch_multihost if multihost else shard_batch
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _end = object()
    err = []

    def producer():
        try:
            for batch in iterator:
                q.put(place(batch, mesh))
        except Exception as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(_end)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _end:
            if err:
                raise err[0]
            return
        yield item
