"""TPU-only gate: the fused Pallas head must compile+run under shard_map
with ``check_vma=True`` on the REAL backend (VERDICT r2 weak #6 / next #8).

Interpret-mode CPU tests must scope check_vma off (jax hlo_interpreter
lowers Pallas block indexing through ops the replication checker rejects —
training.make_train_chunk docstring), so the kernel's vma declarations
(fused_elbo.vma_union on its out_shapes) were previously only validated
when a human ran the bench on TPU. This test automates that: it subprocess-
runs one fused train chunk on the default (TPU) backend — skipped when the
machine has no TPU attached, e.g. plain CPU CI.

The subprocess is required twice over: tests/conftest.py pins THIS
interpreter to the 8-fake-device CPU backend, and this environment's axon
sitecustomize reads env vars at interpreter startup (so the TPU platform
must be selected before python starts).
"""

import os
import subprocess
import sys

import pytest

_INNER = r'''
import sys
import jax
if jax.default_backend() != 'tpu':
    print('GATE_SKIP no TPU backend:', jax.default_backend())
    sys.exit(0)
import numpy as np
from gmvae_tpu import configs, training as train_lib
from gmvae_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()   # repeat invocations skip the remote compile

# small widths keep the remote compile short; the vma declarations under
# test live in the kernel wrapper and are width-independent
cfg = configs.mnist_k10(batch_size=32, enc_hidden=(64, 64),
                        dec_hidden=(64, 64), scan_steps=2, fused=True)
from gmvae_tpu import data as data_lib
ds = data_lib.make_synthetic(image_shape=cfg.image_shape, n_train=256,
                             n_test=64, n_clusters=10)
trainer = train_lib.Trainer(cfg, ds)                 # check_vma=True default
assert trainer.model.head_fn.__name__ == 'fused_mixture_elbo', (
    'fused head not selected on TPU')
state = trainer.init_state()
state, m = trainer.run_chunk(state, trainer.batch_plan(2))
elbo = float(np.asarray(m['elbo'][-1]))              # device fetch = fence
assert np.isfinite(elbo), elbo
print('GATE_OK elbo=%.3f' % elbo)
'''


def test_fused_chunk_check_vma_on_tpu():
    env = dict(os.environ)
    # undo the CPU pinning the test env applies; restore the axon pool var
    # (conftest stashes it) so the sitecustomize can bring up the TPU
    env.pop('JAX_PLATFORMS', None)
    stash = env.pop('_GMVAE_AXON_POOL_IPS_STASH', None)
    if stash is not None:
        env['PALLAS_AXON_POOL_IPS'] = stash
    platforms = env.pop('_GMVAE_JAX_PLATFORMS_STASH', None)
    if platforms is not None:
        env['JAX_PLATFORMS'] = platforms
    env['XLA_FLAGS'] = ' '.join(
        f for f in env.get('XLA_FLAGS', '').split()
        if 'xla_force_host_platform_device_count' not in f)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = repo_root + os.pathsep + env.get('PYTHONPATH', '')
    try:
        proc = subprocess.run([sys.executable, '-c', _INNER], env=env,
                              capture_output=True, text=True, timeout=880)
    except subprocess.TimeoutExpired:
        # the axon tunnel hangs backend init entirely when it is down
        # (observed outage) — an infrastructure condition, not a vma
        # regression; a real regression fails fast with a compile error
        pytest.skip('TPU backend unreachable (tunnel down: backend init '
                    'hung past the timeout)')
    out = proc.stdout + proc.stderr
    if 'GATE_SKIP' in out:
        pytest.skip('no TPU attached: ' + out.splitlines()[-1])
    if 'Unable to initialize backend' in out and 'UNAVAILABLE' in out:
        pytest.skip('TPU backend unavailable (tunnel outage): '
                    + out[-200:])
    assert proc.returncode == 0, out[-3000:]
    assert 'GATE_OK' in out, out[-3000:]
