"""rqvae_tpu: TPU-native RQ-VAE / RQ-Transformer framework."""

import os as _os

import jax as _jax

# Persistent compilation cache: first-compiles through remote TPU backends
# are minutes-long; cache hits make reruns instant. Opt out with
# RQVAE_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("RQVAE_TPU_NO_COMPILE_CACHE"):
    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass

__version__ = "0.1.0"
