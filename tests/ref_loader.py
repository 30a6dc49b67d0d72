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
    def __getattr__(self, item):  # any attribute -> an instantiable,
        return types.SimpleNamespace  # attribute-settable dummy class


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
        for leaf in ("occupancy_flow_metrics_pb2",
                     "occupancy_flow_submission_pb2", "scenario_pb2"):
            setattr(protos, leaf,
                    _fake(f"waymo_open_dataset.protos.{leaf}", leaf=True))
        for leaf in ("occupancy_flow_grids", "occupancy_flow_data",
                     "occupancy_flow_renderer", "occupancy_flow_vis"):
            setattr(utils, leaf,
                    _fake(f"waymo_open_dataset.utils.{leaf}", leaf=True))


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


def set_tfa_focal():
    """Installs a faithful TF implementation of
    tfa.losses.SigmoidFocalCrossEntropy (public tfa focal_loss.py formula:
    reduction defaults to NONE, per-sample sum over the last axis)."""
    install_stubs()
    import tensorflow as tf

    class SigmoidFocalCrossEntropy:
        def __init__(self, from_logits=False, alpha=0.25, gamma=2.0):
            self.from_logits = from_logits
            self.alpha, self.gamma = alpha, gamma

        def __call__(self, y_true, y_pred):
            y_true = tf.cast(y_true, tf.float32)
            y_pred = tf.cast(y_pred, tf.float32)
            ce = tf.keras.backend.binary_crossentropy(
                y_true, y_pred, from_logits=self.from_logits)
            p = tf.sigmoid(y_pred) if self.from_logits else y_pred
            p_t = y_true * p + (1.0 - y_true) * (1.0 - p)
            alpha_f = y_true * self.alpha + (1.0 - y_true) * (1 - self.alpha)
            modulating = tf.pow(1.0 - p_t, self.gamma)
            return tf.reduce_sum(alpha_f * modulating * ce, axis=-1)

    sys.modules["tensorflow_addons"].losses.SigmoidFocalCrossEntropy = \
        SigmoidFocalCrossEntropy
