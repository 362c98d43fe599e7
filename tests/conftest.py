"""Test environment: CPU backend with 8 fake devices.

All tests are CPU-runnable (SURVEY.md §4.2). The 8 fake host devices are how
multi-chip DP is validated without a TPU pod — the standard JAX fake-backend
technique (`--xla_force_host_platform_device_count`).

Subtlety: this environment ships an 'axon' remote-TPU platform whose
sitecustomize imports jax at interpreter startup, so ``JAX_PLATFORMS`` is
already captured into jax's config before this file runs. Setting the env
var is therefore not enough — we must update the live config. XLA_FLAGS is
still read lazily at first backend initialization, so appending the fake-
device flag here (before any backend is touched) works.
"""

import os

# drop the axon remote-TPU pool var for any subprocesses (they must come up
# on CPU), but stash it (and the original platform selection):
# test_tpu_gate.py deliberately restores both to probe the real TPU backend
_pool = os.environ.pop('PALLAS_AXON_POOL_IPS', None)
if _pool is not None:
    os.environ['_GMVAE_AXON_POOL_IPS_STASH'] = _pool
    if os.environ.get('JAX_PLATFORMS'):
        os.environ['_GMVAE_JAX_PLATFORMS_STASH'] = os.environ['JAX_PLATFORMS']
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

assert jax.device_count() >= 8, (
    'tests need 8 fake CPU devices; backend initialized too early: '
    f'{jax.devices()}')
