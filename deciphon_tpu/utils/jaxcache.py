"""Persistent XLA compilation cache setup.

The Viterbi kernels take minutes to compile (Mosaic, large unrolled gather
loops); a persistent cache makes every process after the first start in
milliseconds.  Call before the first jit execution.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "DECIPHON_TPU_CACHE", os.path.expanduser("~/.cache/deciphon_tpu/xla"))


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
