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

os.environ.pop('PALLAS_AXON_POOL_IPS', None)   # for any subprocesses
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
