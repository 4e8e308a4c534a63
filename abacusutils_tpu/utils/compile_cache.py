"""Persistent XLA compilation cache wiring.

Compiles on this platform go through a remote tunnel at 60-120 s per program;
caching them on disk makes every process after the first start in seconds.
Call :func:`enable` before the first jit compile (idempotent, safe anywhere).
"""

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    '.jax_cache',
)


def enable(cache_dir=None):
    """Point JAX's persistent compilation cache at ``cache_dir``
    (default: <repo>/.jax_cache, overridable via ABACUSUTILS_TPU_JAX_CACHE)."""
    import jax

    cache_dir = cache_dir or os.environ.get('ABACUSUTILS_TPU_JAX_CACHE', _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # Cache everything: even sub-second programs cost a tunnel round-trip.
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except Exception as e:  # cache is an optimization, never a hard failure
        import warnings

        warnings.warn(f'could not enable persistent compilation cache: {e}')
    return cache_dir
