"""Regenerate the golden ELBO trajectory (run deliberately, never in CI):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tests/make_golden.py

Freezing seeds + schedule early and never changing them silently is the
whole point (SURVEY.md §7.3 hard part #2) — regeneration must be an explicit
reviewed act.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# dp_devices pinned to 1: per-shard RNG folding makes the trajectory a
# function of mesh size, and the golden must be mesh-independent
OVERRIDES = dict(steps=50, eval_every=10**9, ckpt_every=0, seed=123,
                 dp_devices=1)


def main():
    import numpy as np
    from gmvae_tpu import configs
    from gmvae_tpu import training as train_lib

    cfg = configs.synthetic_tiny(run_dir='/tmp/golden_runs').replace(**OVERRIDES)
    trainer = train_lib.Trainer(cfg)
    state = trainer.init_state()
    idx = trainer.batch_plan(OVERRIDES['steps'])
    state, metrics = trainer.run_chunk(state, idx)
    out = {
        'config_overrides': OVERRIDES,
        'steps': OVERRIDES['steps'],
        'elbo': [float(v) for v in np.asarray(metrics['elbo'])],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'golden',
                        'elbo_synthetic.json')
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', path)
    print('first/last elbo:', out['elbo'][0], out['elbo'][-1])


if __name__ == '__main__':
    main()
