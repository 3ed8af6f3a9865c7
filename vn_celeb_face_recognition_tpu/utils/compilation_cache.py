"""Persistent XLA compilation cache setup.

Remote TPU compilation on the target pods costs minutes per program;
the persistent cache makes every program after the first session free.
Call early (before the first jit execution).
"""

import os


def enable_compilation_cache(path=None):
    import jax

    path = path or os.environ.get(
        "VN_JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return path
    except Exception as exc:
        print(f"Warning: compilation cache unavailable: {exc}")
        return None
