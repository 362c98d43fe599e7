"""Multi-process (simulated multi-host) DP test: 2 local processes, one
global mesh, cross-process psum — validates init via jax.distributed,
put_global assembly, and replicated-state consistency (SURVEY.md §5.8).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), 'multihost', 'worker.py')


def _free_port() -> str:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return str(s.getsockname()[1])


def test_two_process_dp_train_eval_resume(tmp_path):
    """The full pod story on a 2-process mesh: train chunk, sharded-data DP,
    global eval, and fit() with eval cadence + cross-process checkpoint
    resume (VERDICT r2 next-round #1)."""
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    # 2 fake devices PER process -> a 4-device global mesh across 2
    # processes: device boundaries and process boundaries differ, like a
    # real pod host (v5e-16 = 4 hosts x 4 chips)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    # worker imports gmvae_tpu without sys.path hacks: point it at the
    # repo root (works both installed and in-place)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = repo_root + os.pathsep + env.get('PYTHONPATH', '')
    port = _free_port()
    procs = [subprocess.Popen(
                 [sys.executable, WORKER, str(i), port, str(tmp_path)],
                 stdout=subprocess.PIPE,
                 stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    for i, out in enumerate(outs):
        assert 'params_identical=True' in out, out[-2000:]
        assert 'elbo_identical=True' in out, out[-2000:]
        assert 'stream_eq_device=True' in out, out[-2000:]
        assert 'stream_identical=True' in out, out[-2000:]
        assert 'sharded_params_identical=True' in out, out[-2000:]
        assert 'sharded_finite=True' in out, out[-2000:]
        assert 'eval_identical=True' in out, out[-2000:]
        assert 'eval_finite=True' in out, out[-2000:]
        assert 'resume_matches_uninterrupted=True' in out, out[-2000:]
        assert 'fit_params_identical=True' in out, out[-2000:]
        assert 'fit_eval_identical=True' in out, out[-2000:]


def test_four_process_pod_topology(tmp_path):
    """v5e-16 pod-controller topology: 4 processes x 2 fake devices = an
    8-device global mesh, driving the celeba_dp16 STRUCTURE scaled down
    (sharded data + per-leaf clip + conv/gaussian) with dataset sizes that
    divide by neither p=4 nor the device count — process_shard/put_sharded's
    off-by-one and non-power-of-two split regime (VERDICT r4 #5;
    BASELINE.json:11, SURVEY.md §5.8, §4.2)."""
    worker = os.path.join(os.path.dirname(__file__), 'multihost',
                          'worker_pod4.py')
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = repo_root + os.pathsep + env.get('PYTHONPATH', '')
    port = _free_port()
    procs = [subprocess.Popen(
                 [sys.executable, worker, str(i), port, str(tmp_path)],
                 stdout=subprocess.PIPE,
                 stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(4)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    for out in outs:
        assert 'procs=4' in out, out[-2000:]
        assert 'shard_cover=True' in out, out[-2000:]
        assert 'params_identical=True' in out, out[-2000:]
        assert 'elbo_finite=True' in out, out[-2000:]
        assert 'eval_identical=True' in out, out[-2000:]
        assert 'eval_finite=True' in out, out[-2000:]
        assert 'resume_matches_uninterrupted=True' in out, out[-2000:]
        assert 'fit_params_identical=True' in out, out[-2000:]
        assert 'fit_eval_identical=True' in out, out[-2000:]
        assert 'stream_eq_device=True' in out, out[-2000:]
        assert 'stream_identical=True' in out, out[-2000:]


def test_env_var_pod_bootstrap():
    """init_distributed itself forms the mesh from the standard JAX pod
    env vars — the exact path `python -m gmvae_tpu train` takes on a pod
    (regression: the old guard initialized the backend first and made
    jax.distributed.initialize() raise on every real launch)."""
    worker = os.path.join(os.path.dirname(__file__), 'multihost',
                          'worker_envboot.py')
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.pop('PALLAS_AXON_POOL_IPS', None)
        env['JAX_PLATFORMS'] = 'cpu'
        env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
        env['PYTHONPATH'] = repo_root + os.pathsep + env.get('PYTHONPATH',
                                                             '')
        env['JAX_COORDINATOR_ADDRESS'] = f'localhost:{port}'
        env['GMVAE_NUM_PROCESSES'] = '2'
        env['GMVAE_PROCESS_ID'] = str(i)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(i)], stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, env=env, text=True))
    for p in procs:
        out, _ = p.communicate(timeout=480)
        assert p.returncode == 0, out[-2000:]
        assert 'procs=2' in out and 'params_identical=True' in out, \
            out[-2000:]
        assert 'elbo_finite=True' in out, out[-2000:]
