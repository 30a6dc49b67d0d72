"""Shared loader for the reference TF implementation.

Imports the reference's Keras-2 code via tf_keras and stubs the uninstalled
tensorflow_addons / waymo_open_dataset packages. The tensorflow.keras alias
stays in place for the process (tf_keras is API-compatible for everything
these tests use).
"""

import sys
import types

REF = "/root/reference"
_loaded = {}


class _StubModule(types.ModuleType):
    def __getattr__(self, item):  # any attribute -> a dummy class
        return object


def _fake(name, leaf=False):
    m = _StubModule(name) if leaf else types.ModuleType(name)
    sys.modules[name] = m
    return m


def install_stubs():
    import tensorflow as tf
    import tf_keras

    if sys.modules.get("tensorflow.keras") is not tf_keras:
        sys.modules["tensorflow.keras"] = tf_keras
        sys.modules["tensorflow.keras.layers"] = tf_keras.layers
        tf.keras = tf_keras

    if "tensorflow_addons" not in sys.modules:
        tfa = _fake("tensorflow_addons")
        tfa.layers = types.SimpleNamespace(MultiHeadAttention=object)
        tfa.losses = types.SimpleNamespace(SigmoidFocalCrossEntropy=object)
    if "waymo_open_dataset" not in sys.modules:
        wod = _fake("waymo_open_dataset")
        protos = _fake("waymo_open_dataset.protos")
        utils = _fake("waymo_open_dataset.utils")
        wod.protos, wod.utils = protos, utils
        protos.occupancy_flow_metrics_pb2 = _fake(
            "waymo_open_dataset.protos.occupancy_flow_metrics_pb2",
            leaf=True)
        utils.occupancy_flow_grids = _fake(
            "waymo_open_dataset.utils.occupancy_flow_grids", leaf=True)


def load_reference_module(name):
    """Imports a module file from /root/reference with stubs installed."""
    if name in _loaded:
        return _loaded[name]
    install_stubs()
    sys.path.insert(0, REF)
    try:
        mod = __import__(name)
    finally:
        sys.path.remove(REF)
    _loaded[name] = mod
    return mod


def set_tfa_mha(mha_class):
    """Replaces the tfa MultiHeadAttention stub with a real implementation."""
    install_stubs()
    sys.modules["tensorflow_addons"].layers.MultiHeadAttention = mha_class
