"""Test configuration: force an 8-device virtual CPU mesh.

This environment preloads jax via a sitecustomize hook (axon TPU tunnel), so
JAX_PLATFORMS env vars are read before our code runs — switch the platform
through jax.config before any backend initializes instead.
"""

import os

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: XLA-CPU compiles of the model stack dominate
# test wall-clock; cache them across runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches",
                  "xla_gpu_per_fusion_autotune_cache_dir")

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8
