"""circminer-tpu: TPU-native circRNA detection framework."""

import os as _os


def enable_compilation_cache(path: str = None):
    """Persistent XLA compilation cache: cold-start compiles of the chain DP
    shapes take tens of seconds on the tunneled TPU; caching them on disk
    makes every process after the first start warm."""
    import jax
    path = path or _os.path.expanduser("~/.cache/circminer_tpu_xla")
    _os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


__version__ = "0.1.0"
