"""JAX runtime setup: persistent compilation cache.

Alignment kernels are shape-bucketed but still expensive to compile
(~30-60 s each on CPU, ~20-40 s on TPU). A persistent cache makes every run
after the first start instantly. Disable with DESCRIBEALIGN_NO_JAX_CACHE=1.
"""
import os

_DONE = False


def setup_jax_cache():
    global _DONE
    if _DONE or os.environ.get('DESCRIBEALIGN_NO_JAX_CACHE'):
        _DONE = True
        return
    _DONE = True
    try:
        import jax
        # separate cache dirs per backend: CPU AOT artifacts are machine
        # specific and must not mix with remote-compiled TPU entries.
        # jax.config wins over the env var: conftest/dryrun override a stale
        # JAX_PLATFORMS=axon (set by a sitecustomize hook) via the config.
        platform = (jax.config.jax_platforms
                    or os.environ.get('JAX_PLATFORMS', 'default')).split(',')[0]
        if platform == 'cpu':
            # CPU compiles are fast, and in remote-compile environments the
            # cached CPU AOT artifacts may target a different host CPU
            # (SIGILL risk) - skip persistence
            return
        cache_dir = os.environ.get(
            'DESCRIBEALIGN_JAX_CACHE_DIR',
            os.path.join(os.path.expanduser('~'), '.cache',
                         'describealign_tpu', f'jax_cache_{platform}'))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except Exception:
        pass  # cache is an optimization only; never fail import over it
