"""Persistent XLA compilation cache.

On remote-compile TPU platforms (this environment's axon tunnel, and any
pod where compiles round-trip a compile service) a cold compile of the
conv/celeba-scale train chunk costs minutes of wall clock. JAX's built-in
persistent cache (``jax_compilation_cache_dir``) keys compiled executables
by (HLO, compile options, runtime version), so every repeat invocation —
CLI runs, sweeps, `tools/reproduce_baselines.py`, bench — becomes a disk
hit. Measured here (v5e via axon): a toy jit 150s -> 33s process start to
first result; model-scale chunks skip their multi-minute compile entirely.

Enabled by the CLI and bench entry points. Library code (`Trainer`) does
NOT touch it — a library must not mutate global jax config behind the
caller's back.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> str | None:
    """Point jax at a persistent on-disk compilation cache.

    Resolution order: an existing ``JAX_COMPILATION_CACHE_DIR`` env var
    wins (jax already honors it — nothing to do); ``GMVAE_COMPILE_CACHE``
    names the directory, or disables with '0'; default
    ``~/.cache/gmvae_tpu/xla``. Returns the directory in use, or None when
    disabled/unavailable.
    """
    if os.environ.get('JAX_COMPILATION_CACHE_DIR'):
        return os.environ['JAX_COMPILATION_CACHE_DIR']
    v = os.environ.get('GMVAE_COMPILE_CACHE', '')
    if v == '0':
        return None
    path = v or os.path.join(os.path.expanduser('~'), '.cache',
                             'gmvae_tpu', 'xla')
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update('jax_compilation_cache_dir', path)
    except (OSError, AttributeError):
        return None
    return path
