"""Device mesh + sharding rules (the distribution story of the framework).

The reference's only parallelism is single-host data parallelism via
``tf.distribute.MirroredStrategy`` with implicit NCCL all-reduce (reference
train.py:69,319; SURVEY.md §2.7). The TPU-native equivalent:

- a 2-D ``Mesh(('data', 'model'))`` over all devices;
- the global batch sharded over 'data' (NamedSharding on axis 0);
- large attention/MLP kernels optionally sharded over 'model' (tensor
  parallelism) via name-pattern rules below;
- gradients never touch user code: XLA GSPMD inserts the ICI all-reduces
  where the sharded program needs them (replacing MirroredStrategy's NCCL
  collectives and the manual ``/replica`` loss bookkeeping,
  reference loss.py:200,229 + train.py:226-229).

The model is ~13M params, so 'model' defaults to 1 (pure DP) — the rules
exist so the same program scales TP-wise without code changes, and so the
multi-chip dry run exercises real mixed dp/tp shardings.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None,
                model_axis: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    """Creates a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % model_axis != 0:
        raise ValueError(f"{n_devices} devices not divisible by "
                         f"model_axis={model_axis}")
    grid = devices.reshape(n_devices // model_axis, model_axis)
    return Mesh(grid, axis_names=("data", "model"))


# (regex on the flattened param path, PartitionSpec) — first match wins.
# Kernels are [in, out] for Dense, [h, in, out] for tfa-MHA einsum weights.
_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    # Swin window attention: qkv column-parallel, proj row-parallel.
    (r"attn/qkv/kernel$", P(None, "model")),
    (r"attn/proj/kernel$", P("model", None)),
    # MLPs: fc1 column-parallel, fc2 row-parallel.
    (r"mlp/fc1/kernel$", P(None, "model")),
    (r"mlp/fc2/kernel$", P("model", None)),
    # tfa-style MHA: shard the head axis.
    (r"(query|key|value)_kernel$", P("model", None, None)),
    (r"projection_kernel$", P("model", None, None)),
    # Per-waypoint stacked cross-attention (leading waypoint axis): shard
    # the head axis which sits at index 1 after vmap stacking.
    (r"cross_attn_obs/.*(query|key|value)_kernel$", P(None, "model", None,
                                                      None)),
    (r"cross_attn_obs/.*projection_kernel$", P(None, "model", None, None)),
    # Trajectory FFNs.
    (r"FFN1/kernel$", P(None, "model")),
    (r"FFN2/kernel$", P("model", None)),
)


def param_partition_spec(path: str, shape: Tuple[int, ...],
                         mesh: Optional[Mesh] = None) -> P:
    """PartitionSpec for one parameter from its flattened path.

    A rule only applies if its rank matches and every sharded dimension is
    divisible by the mesh axis size (e.g. 3-head attention stays replicated
    on a model_axis=2 mesh).
    """
    for pattern, spec in _PARAM_RULES:
        if re.search(pattern, path):
            if len(spec) != len(shape):
                continue
            if mesh is not None:
                ok = all(
                    axis is None or shape[i] % mesh.shape[axis] == 0
                    for i, axis in enumerate(spec))
                if not ok:
                    continue
            return spec
    return P()  # replicate


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def params_pspec_tree(params, mesh: Optional[Mesh] = None):
    """PartitionSpec pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, x: param_partition_spec(_path_str(kp), x.shape, mesh),
        params)


def shard_params(params, mesh: Mesh):
    """Places parameters on the mesh per the TP rules (replicated default)."""
    def place(kp, x):
        spec = param_partition_spec(_path_str(kp), x.shape, mesh)
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh):
    """Shards every array's leading (batch) axis over 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def batch_pspec_tree(batch):
    return jax.tree_util.tree_map(lambda x: P("data"), batch)


def shard_batch_multihost(batch, mesh: Mesh):
    """Multi-host batch placement: each process contributes its local shard.

    Single-host meshes use :func:`shard_batch` (plain device_put). On a
    multi-host mesh (e.g. a v5e pod slice), every process feeds only its
    per-host slice of the global batch (cut by
    ``data/pipeline.py`` ``shard_index/shard_count``) and
    ``jax.make_array_from_process_local_data`` assembles the global array —
    the TPU-native replacement for MirroredStrategy's dataset distribution
    (reference train.py:295-296).
    """
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        batch)


def active_mesh(axis: str = "data") -> Optional[Mesh]:
    """The physical mesh of the enclosing ``with mesh:`` context, when one
    with more than one device and the named axis is active at trace time.

    Used by the kernel call sites (models/swin.py, core/sampling.py) to
    decide whether a ``pallas_call`` must be wrapped in ``jax.shard_map``
    so it composes with the multi-chip program: GSPMD treats a bare
    ``pallas_call`` as an opaque custom call it cannot partition, so on a
    >1-device mesh the kernels either ride shard_map over the batch axis
    or fall back to XLA (SURVEY §2.7 "kernels remain shardable").
    """
    try:
        from jax._src import mesh as mesh_lib
        m = mesh_lib.thread_resources.env.physical_mesh
    except Exception:
        return None
    if m.empty or m.size <= 1 or axis not in m.axis_names:
        return None
    return m


def data_shard_map(fn, mesh: Mesh, n_sharded: int, n_replicated: int,
                   axis: str = "data"):
    """Wraps ``fn(*sharded, *replicated)`` in shard_map over ``axis``.

    The first ``n_sharded`` array arguments split on their leading (batch)
    dimension; the rest are replicated. Gradient flow is standard shard_map
    autodiff: cotangents of replicated operands are psummed over the axis
    at the boundary. ``check_vma=False`` because Pallas calls carry no
    replication rules.
    """
    in_specs = tuple([P(axis)] * n_sharded + [P()] * n_replicated)
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=P(axis), check_vma=False)


def sharding_hint(x, *axes):
    """Best-effort ``with_sharding_constraint`` for activation (sp) sharding.

    Annotates ``x`` with ``PartitionSpec(*axes)`` when a mesh context with
    the named axes is active and every sharded dim divides; otherwise
    returns ``x`` unchanged. This is the GSPMD-idiomatic way to spatially
    partition the 512^2 activation maps: the model stays a single program,
    the hints pin the intended layout, and XLA inserts the halo-exchange /
    resharding collectives.
    """
    try:
        return jax.lax.with_sharding_constraint(x, P(*axes))
    except Exception:
        return x
