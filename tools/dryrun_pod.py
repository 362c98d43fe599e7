"""Pod pre-flight: compile + run a named config's FULL train step (and one
eval batch) over an N-device VIRTUAL mesh — no pod required.

Validates the exact sharding program a pod launch would run (shard_map
over the data mesh, psum, sharded/replicated dataset placement, per-leaf
clip, eval all-gather) on fake CPU devices, so mesh-shape or divisibility
mistakes fail here in minutes instead of on a v5e-16 reservation. Scale
knobs (batch, dataset rows, steps) are shrunk; everything structural is
the named config's own.

    python tools/dryrun_pod.py --config celeba_dp16 --devices 16
    python tools/dryrun_pod.py --config mnist_k10 --devices 8

Self-bootstraps onto the virtual CPU backend via subprocess re-exec (this
environment pins the parent interpreter to a remote-TPU platform at
startup; same technique as __graft_entry__.dryrun_multichip).
"""

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: script mode
# puts tools/ (not the repo root) on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import subprocess
import sys


def _bootstrap(n_devices: int) -> bool:
    # decide from the environment BEFORE touching jax: with the axon
    # remote-TPU pool var set, merely initializing the backend opens the
    # tunnel — and hangs indefinitely when the tunnel is down (observed).
    # The re-exec'd child runs with a clean CPU env either way.
    axon = bool(os.environ.get('PALLAS_AXON_POOL_IPS'))
    if not axon:
        import jax
        if (jax.default_backend() == 'cpu'
                and len(jax.devices()) >= n_devices):
            return False
    if os.environ.get('_GMVAE_PODDRY_INNER'):
        raise RuntimeError('bootstrapped subprocess still lacks an '
                           f'{n_devices}-device CPU backend')
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    env['_GMVAE_PODDRY_INNER'] = '1'
    flags = [f for f in env.get('XLA_FLAGS', '').split()
             if 'xla_force_host_platform_device_count' not in f]
    flags.append(f'--xla_force_host_platform_device_count={n_devices}')
    env['XLA_FLAGS'] = ' '.join(flags)
    rc = subprocess.run([sys.executable] + sys.argv, env=env).returncode
    sys.exit(rc)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default='celeba_dp16')
    ap.add_argument('--devices', type=int, default=16)
    ap.add_argument('--steps', type=int, default=2)
    ap.add_argument('--placement', default=None,
                    choices=('device', 'host_stream'),
                    help="override data_placement (host_stream forces "
                         "data_sharding='replicated' and drives the "
                         'staged-batch path over the virtual mesh)')
    args = ap.parse_args()
    _bootstrap(args.devices)

    import jax
    import numpy as np

    from gmvae_tpu import configs
    from gmvae_tpu import data as data_lib
    from gmvae_tpu import training as train_lib

    n = args.devices
    cfg = configs.get_config(args.config)
    # shrink scale only: per-shard batch of 2, tiny dataset, no fused
    # kernel off-TPU (make_model falls back automatically)
    cfg = cfg.replace(batch_size=2 * n, scan_steps=args.steps,
                      steps=args.steps, eval_every=10**9, ckpt_every=0,
                      dp_devices=n, eval_samples=1)
    if args.placement:
        cfg = cfg.replace(data_placement=args.placement)
        if args.placement == 'host_stream':
            cfg = cfg.replace(data_sharding='replicated')
    ds = data_lib.make_synthetic(image_shape=cfg.image_shape,
                                 n_clusters=min(40, cfg.n_components),
                                 n_train=8 * n, n_test=2 * n, seed=0)
    trainer = train_lib.Trainer(cfg, ds)
    assert trainer.n_dp == n, (trainer.n_dp, n)
    state = trainer.init_state()
    payload = (trainer.stage_batches(trainer.batch_plan_host(args.steps))
               if trainer.x_all is None
               else trainer.batch_plan(args.steps))
    state, m = trainer.run_chunk(state, payload)
    elbo = float(np.asarray(m['elbo'][-1]))
    ev = trainer.evaluate(state, max_examples=2 * n)
    ok = bool(np.isfinite(elbo) and np.isfinite(ev['elbo_nats']))
    print(json.dumps({
        'config': args.config, 'devices': n,
        'data_placement': cfg.data_placement,
        'data_sharding': cfg.data_sharding,
        'grad_clip_impl': cfg.grad_clip_impl,
        'train_elbo': round(elbo, 4),
        'eval_elbo_nats': round(ev['elbo_nats'], 4),
        'ok': ok,
    }))
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
