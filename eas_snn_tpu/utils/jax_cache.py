"""Persistent XLA compilation cache setup.

The axon TPU tunnel compiles remotely (~minutes per program); caching the
serialized executables under ``~/.cache/eas_snn_tpu_xla`` makes repeated
runs of the same program shapes start in seconds. Call before the first
computation (importing is enough for the CLI tools).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/eas_snn_tpu_xla")


def enable_compilation_cache(path: str = _DEFAULT) -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or backend without cache support
