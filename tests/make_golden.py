"""Regenerate the golden ELBO trajectories (run deliberately, never in CI):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tests/make_golden.py

Freezing seeds + schedule early and never changing them silently is the
whole point (SURVEY.md §7.3 hard part #2) — regeneration must be an explicit
reviewed act.

Three goldens:
  elbo_synthetic.json       — synthetic_tiny, 50 steps (fast CI tier)
  elbo_synthetic_hard.json  — synthetic_hard (the overlapping-cluster
                              quality fixture, BASELINE.md r2), 50 steps
  elbo_synthetic_deep.json  — synthetic_tiny with model_family='deep'
                              (the hierarchical deep-mixture variant,
                              models/deep.py), 50 steps
"""

import json
import os

# dp_devices pinned to 1: per-shard RNG folding makes the trajectory a
# function of mesh size, and the golden must be mesh-independent.
# metrics_mode pinned to 'stacked': goldens ARE per-step trajectories
# (production configs may default to 'mean' chunk metrics).
OVERRIDES = dict(steps=50, eval_every=10**9, ckpt_every=0, seed=123,
                 dp_devices=1, metrics_mode='stacked')

GOLDENS = {
    'elbo_synthetic.json': ('synthetic_tiny', {}),
    'elbo_synthetic_hard.json': ('synthetic_hard', {}),
    'elbo_synthetic_deep.json': ('synthetic_tiny',
                                 {'model_family': 'deep', 'w_dim': 4,
                                  'prior_hidden': 16}),
}


def write_golden(fname: str, config_name: str, extra: dict) -> None:
    import numpy as np
    from gmvae_tpu import configs
    from gmvae_tpu import training as train_lib

    overrides = {**OVERRIDES, **extra}
    cfg = configs.get_config(config_name,
                             run_dir='/tmp/golden_runs').replace(**overrides)
    trainer = train_lib.Trainer(cfg)
    state = trainer.init_state()
    idx = trainer.batch_plan(overrides['steps'])
    state, metrics = trainer.run_chunk(state, idx)
    out = {
        'config': config_name,
        'config_overrides': overrides,
        'steps': overrides['steps'],
        'elbo': [float(v) for v in np.asarray(metrics['elbo'])],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'golden',
                        fname)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', path)
    print('first/last elbo:', out['elbo'][0], out['elbo'][-1])


def main():
    for fname, (config_name, extra) in GOLDENS.items():
        write_golden(fname, config_name, extra)


if __name__ == '__main__':
    main()
