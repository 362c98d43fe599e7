"""Env-var pod-bootstrap worker for tests/test_multihost.py.

Unlike worker.py (which calls jax.distributed.initialize() explicitly,
the launcher-does-it pattern), THIS worker validates the framework's own
bootstrap: the standard JAX pod env vars are set, nothing touches jax
before the Trainer, and ``parallel.mesh.init_distributed`` (called from
``Trainer.__init__``) must form the 2-process mesh itself. This is the
path a real `python -m gmvae_tpu train` pod launch takes — and the path
the round-3 review found broken (the old guard queried process_count(),
which initializes the XLA backend and makes initialize() raise).

Run with: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID set.
"""
import os
import sys

os.environ.pop('PALLAS_AXON_POOL_IPS', None)
os.environ['JAX_PLATFORMS'] = 'cpu'

# IMPORTANT: no jax API calls before Trainer — init_distributed must be
# the first thing that brings up the runtime, exactly like a CLI launch
from gmvae_tpu import configs, training as train_lib  # noqa: E402
from gmvae_tpu import data as data_lib  # noqa: E402

cfg = configs.synthetic_tiny(batch_size=16, fused=False)
ds = data_lib.make_synthetic(image_shape=cfg.image_shape, n_train=64,
                             seed=0)
trainer = train_lib.Trainer(cfg, ds)

import jax  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
state = trainer.init_state()
state, m = trainer.run_chunk(state, trainer.batch_plan(2))
leaf = np.asarray(
    jax.tree.leaves(state.params)[0].addressable_shards[0].data)
g = multihost_utils.process_allgather(leaf)
same = bool(np.array_equal(g[0], g[1]))
elbo = float(np.asarray(m['elbo'].addressable_shards[0].data)[-1])
print(f'[p{sys.argv[1] if len(sys.argv) > 1 else "?"}] ENVBOOT '
      f'procs={jax.process_count()} params_identical={same} '
      f'elbo_finite={bool(np.isfinite(elbo))}', flush=True)
