"""Shared loader for the reference TF implementation.

Thin re-export of :mod:`strajnet_tpu.interop.refload` — the stub installer
and reference-module loader were promoted out of the tests into the
framework so the checkpoint importer (tools/import_ref_weights.py) can use
them; the tests keep importing from here.
"""

from strajnet_tpu.interop.refload import (  # noqa: F401
    DEFAULT_REF_DIR as REF,
    install_stubs,
    load_reference_module,
    make_tfa_mha_class,
    set_tfa_focal,
    set_tfa_mha,
)
