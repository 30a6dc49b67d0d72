"""Interop with the reference TF2 implementation.

``refload`` imports the reference's Keras-2 modules (with stubs for its
uninstalled dependencies); ``ref_import`` maps reference Keras weights onto
this framework's Flax parameter tree — the same machinery the golden parity
tests use, promoted to a user-facing checkpoint importer
(tools/import_ref_weights.py).
"""
