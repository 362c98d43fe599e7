"""Eval-sweep wall-clock: staged protocol vs the legacy per-batch one.

VERDICT r3 #5 evidence tool. ``training.evaluate`` now stages the eval
set (one async put_global per byte-bounded super-stage, device-side batch
slices, one end fetch); before, each batch paid a sequential
put -> dispatch -> three-fetch cycle — on the remote-TPU tunnel, ~79
serial round-trips for a 10k-example eval. This times both protocols on
the SAME params/batches/keys (the legacy arm is inlined here verbatim
from the pre-change code) and asserts their metrics are bit-identical,
then prints one JSON line per arm plus the speedup.

    python tools/bench_eval.py mnist_k10
    python tools/bench_eval.py mnist_k10 --examples 2048 --repeats 3
"""

from __future__ import annotations

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: script mode
# puts tools/ (not the repo root) on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gmvae_tpu import configs
from gmvae_tpu import data as data_lib
from gmvae_tpu import training as train_lib
from gmvae_tpu.parallel import mesh as mesh_lib


def legacy_evaluate(eval_step, cfg, mesh, params, test_x, test_y, step,
                    seed=17, batch_size=None):
    """The pre-staging protocol, verbatim: per-batch put_global + three
    np.asarray fetches. Kept here (not in the library) purely as the
    measured 'before' arm."""
    from gmvae_tpu.utils import metrics as metrics_lib
    bs = batch_size or cfg.batch_size
    xs, n = train_lib.pad_to_multiple(np.asarray(test_x), bs)
    key = jax.random.PRNGKey(seed)
    elbos, iwaes, yhats = [], [], []
    step_arr = jnp.int32(step)
    for i in range(0, xs.shape[0], bs):
        k = jax.random.fold_in(key, i)
        batch = mesh_lib.put_global(mesh, P(mesh_lib.DATA_AXIS),
                                    xs[i:i + bs])
        e, iw, y = eval_step(params, batch, k, step_arr)
        elbos.append(np.asarray(e))
        iwaes.append(np.asarray(iw))
        yhats.append(np.asarray(y))
    elbo = float(np.concatenate(elbos)[:n].mean())
    out = {'elbo_nats': elbo,
           'iwae_nats': float(np.concatenate(iwaes)[:n].mean())}
    if test_y is not None:
        yhat = np.concatenate(yhats)[:n]
        out['acc'] = metrics_lib.cluster_acc(test_y, yhat)
        out['nmi'] = metrics_lib.nmi(test_y, yhat)
    return out


def main(argv=None) -> None:
    from gmvae_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument('config', nargs='?', default='mnist_k10')
    ap.add_argument('--examples', type=int, default=10_000)
    ap.add_argument('--repeats', type=int, default=3)
    args = ap.parse_args(argv)

    cfg = configs.get_config(args.config).replace(eval_every=10**9,
                                                  ckpt_every=0)
    ds = data_lib.load(cfg.dataset, image_shape=cfg.image_shape)
    trainer = train_lib.Trainer(cfg, ds)
    state = trainer.init_state()
    xs = ds.test_x[:args.examples]
    ys = ds.test_y[:args.examples]

    arms = {
        'staged': lambda: train_lib.evaluate(
            trainer.eval_step, cfg, trainer.mesh, state.params, xs, ys,
            int(state.step)),
        'legacy_per_batch': lambda: legacy_evaluate(
            trainer.eval_step, cfg, trainer.mesh, state.params, xs, ys,
            int(state.step)),
    }
    # warmup both (compile is shared: same jitted eval_step) + bit-check
    warm = {name: fn() for name, fn in arms.items()}
    assert warm['staged'] == warm['legacy_per_batch'], warm

    secs = {}
    for name, fn in arms.items():
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn()   # dict of host floats — inherently fenced
            ts.append(time.perf_counter() - t0)
        secs[name] = min(ts)
        print(json.dumps({'arm': name, 'eval_secs': round(secs[name], 4),
                          'examples': int(xs.shape[0]),
                          'batches': -(-xs.shape[0] // cfg.batch_size),
                          'repeats': args.repeats, 'config': args.config,
                          **{k: out[k] for k in ('elbo_nats',)}}),
              flush=True)
    print(json.dumps({'speedup': round(
        secs['legacy_per_batch'] / max(secs['staged'], 1e-9), 2),
        'config': args.config}), flush=True)


if __name__ == '__main__':
    main()
