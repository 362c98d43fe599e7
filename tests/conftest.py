"""Test environment: CPU backend with 8 fake devices.

All tests are CPU-runnable (SURVEY.md §4.2). The 8 fake host devices are how
multi-chip DP is validated without a TPU pod — the standard JAX fake-backend
technique (`--xla_force_host_platform_device_count`).

This file must run before any test module imports jax, which pytest
guarantees for a root conftest.
"""

import os

# Force the CPU backend: this environment also ships an 'axon' remote-TPU
# platform whose sitecustomize registers itself whenever PALLAS_AXON_POOL_IPS
# is set (and every jit then compiles over a slow tunnel). Tests must not
# depend on — or monopolize — the real chip.
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.pop('PALLAS_AXON_POOL_IPS', None)
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
