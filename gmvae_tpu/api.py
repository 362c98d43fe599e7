"""Public API: the four verbs the reference exposes (BASELINE.json:5).

``train``, ``eval_elbo``, ``sample``/``reconstruct``, ``cluster_assign`` —
stable functions re-exported at the package root (SURVEY.md §1.2 layer 6).
All verbs are deterministic given (params, seed) and run as single jitted
XLA programs on device; only ``train`` involves collectives.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gmvae_tpu import training as train_lib
from gmvae_tpu.configs import Config, get_config
from gmvae_tpu.parallel import mesh as mesh_lib
from gmvae_tpu.utils import metrics as metrics_lib


def _jitted(trainer: train_lib.Trainer, name: str, make):
    """Per-trainer cache of a verb's jitted fn: jit caches key on the
    wrapper object, so defining the closure inside each call would
    re-trace (and re-compile — minutes on the remote-compile platform)
    on EVERY invocation; caching on the trainer makes repeat calls free."""
    cache = trainer.__dict__.setdefault('_api_jit_cache', {})
    if name not in cache:
        cache[name] = make()
    return cache[name]


def _put(trainer: train_lib.Trainer, host_array):
    """Replicate a host array onto the trainer's full mesh. Multi-host, a
    plain ``jnp.asarray`` would be a process-local array that cannot feed a
    jit whose other inputs (the params) span processes — every verb
    therefore routes host inputs through ``put_global``."""
    from jax.sharding import PartitionSpec as P
    return mesh_lib.put_global(trainer.mesh, P(), host_array)


def train(cfg: Config | str, dataset=None, resume: bool = False,
          save_grids: bool = False, **overrides):
    """Train a GMVAE config to completion.

    Args:
      cfg: a ``Config`` or a named BASELINE config ('mnist_k10', ...).
      dataset: optional pre-loaded ``data.Dataset`` (tests pass synthetic).
      resume: restore from the latest checkpoint in the run dir.
    Returns:
      (trainer, state, history) — trainer owns the mesh + jitted fns, state
      holds params/opt-state/step, history is the list of eval rows.
    """
    if isinstance(cfg, str):
        cfg = get_config(cfg, **overrides)
    elif overrides:
        cfg = cfg.replace(**overrides)
    return train_lib.fit(cfg, dataset=dataset, resume=resume,
                         save_grids=save_grids)


def eval_elbo(trainer: train_lib.Trainer, state: train_lib.TrainState,
              dataset=None, max_examples: Optional[int] = None
              ) -> Dict[str, float]:
    """Test-set ELBO in nats (+ ACC/NMI when labels exist) — SURVEY.md §3.2.

    Reuses the identical ELBO code path as training, so reported nats are
    the trained objective.
    """
    if dataset is not None:
        return train_lib.evaluate(trainer.eval_step, trainer.cfg,
                                  trainer.mesh, state.params, dataset.test_x,
                                  dataset.test_y, int(state.step))
    return trainer.evaluate(state, max_examples=max_examples)


def sample(trainer: train_lib.Trainer, state: train_lib.TrainState,
           n: int, seed: int = 0,
           component: Optional[int] = None) -> np.ndarray:
    """Generative sampling: k ~ Cat(pi) (or fixed), z ~ N_k, decode
    (SURVEY.md §3.3). Returns [n, H, W, C] float images in likelihood-mean
    space."""
    model = trainer.model

    def make():
        @functools.partial(jax.jit, static_argnums=(2, 3))
        def go(params, key, n, component):
            return model.apply({'params': params}, key, n, component,
                               method=model.sample)
        return go

    go = _jitted(trainer, 'sample', make)
    key = jax.device_put(jax.random.PRNGKey(seed),
                         mesh_lib.replicated(trainer.mesh))
    out = go(state.params, key, n, component)
    return np.asarray(out)


def reconstruct(trainer: train_lib.Trainer, state: train_lib.TrainState,
                x: np.ndarray) -> np.ndarray:
    """Encode -> posterior-mean latent -> decode (SURVEY.md §3.3).

    ``x`` is uint8 [N,H,W,C] (raw) or float in [0,1]; returns float images.
    """
    model = trainer.model
    go = _jitted(trainer, 'reconstruct', lambda: jax.jit(
        lambda params, xb: model.apply({'params': params}, xb,
                                       method=model.reconstruct)))
    x = np.asarray(x)
    xf = x.astype(np.float32) / 255.0 if x.dtype == np.uint8 else x
    return np.asarray(go(state.params, _put(trainer, xf)))


def cluster_assign(trainer: train_lib.Trainer, state: train_lib.TrainState,
                   x: np.ndarray, batch_size: int = 1024) -> np.ndarray:
    """argmax_k q(k|x) cluster ids for a batch of images (SURVEY.md §3.4)."""
    model = trainer.model
    go = _jitted(trainer, 'cluster_assign', lambda: jax.jit(
        lambda params, xb: jnp.argmax(
            model.apply({'params': params}, xb,
                        method=model.cluster_logits), axis=-1)))
    x = np.asarray(x)
    xf = x.astype(np.float32) / 255.0 if x.dtype == np.uint8 else x
    outs = [np.asarray(go(state.params, _put(trainer, xf[i:i + batch_size])))
            for i in range(0, xf.shape[0], batch_size)]
    return np.concatenate(outs) if outs else np.zeros((0,), np.int32)


def latent_embed(trainer: train_lib.Trainer, state: train_lib.TrainState,
                 x: np.ndarray, batch_size: int = 1024):
    """Posterior-mean latent embedding: (z [N,D], cluster probs [N,K]).

    The quantity behind the reference's latent-space plots; pair with
    ``utils.logging.save_latent_plot`` for the qualitative output."""
    model = trainer.model
    go = _jitted(trainer, 'latent_embed', lambda: jax.jit(
        lambda params, xb: model.apply({'params': params}, xb,
                                       method=model.latent)))
    x = np.asarray(x)
    xf = x.astype(np.float32) / 255.0 if x.dtype == np.uint8 else x
    zs, qs = [], []
    for i in range(0, xf.shape[0], batch_size):
        z, q = go(state.params, _put(trainer, xf[i:i + batch_size]))
        zs.append(np.asarray(z))
        qs.append(np.asarray(q))
    if not zs:
        return (np.zeros((0, trainer.cfg.latent_dim), np.float32),
                np.zeros((0, trainer.cfg.n_components), np.float32))
    return np.concatenate(zs), np.concatenate(qs)


def cluster_metrics(labels_true: np.ndarray,
                    labels_pred: np.ndarray) -> Dict[str, float]:
    """Hungarian-matched ACC + NMI on host (SURVEY.md §3.4)."""
    return {'acc': metrics_lib.cluster_acc(labels_true, labels_pred),
            'nmi': metrics_lib.nmi(labels_true, labels_pred)}
