"""Serving-artifact benchmark: end-to-end latency/throughput of exported verbs.

Measures what a serving binary would see: ``jax.export`` artifact
(`gmvae_tpu/serving.py`) deserialized once, then per batch size the full
round trip host input -> ``.call`` -> fetch outputs to host. The fetch is
deliberately inside the timed region — on this platform only device->host
transfers truly synchronize (PERF.md "Environment quirks"), and a server
must materialize the ids/images anyway, so call+fetch is the honest
serving unit.

Usage (real TPU chip):
    python tools/bench_serving.py --config mnist_k10 \
        --verbs assign,reconstruct --batches 1,8,64,256,1024 --iters 50

Prints one JSON row per (verb, batch): p50/p90 latency ms and img/s.
Compile time is excluded (one warmup call per shape; batch polymorphism
means ONE artifact serves every row, but each new input shape still
compiles once at call time — also reported, as a server cares about it).
"""

from __future__ import annotations

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: script mode
# puts tools/ (not the repo root) on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import statistics
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default='mnist_k10')
    ap.add_argument('--verbs', default='assign,reconstruct')
    ap.add_argument('--batches', default='1,8,64,256,1024')
    ap.add_argument('--iters', type=int, default=50)
    ap.add_argument('--ckpt', default=None,
                    help='optional trained checkpoint (throughput is '
                         'weight-independent; default: init params)')
    args = ap.parse_args()

    from gmvae_tpu.utils import compile_cache
    compile_cache.enable_compile_cache()

    from gmvae_tpu import configs, serving
    from gmvae_tpu import training as train_lib
    from jax import export as jexport

    cfg = configs.get_config(args.config)
    # stub dataset: export/serving needs only model/mesh/params, and the
    # full training set would ride the slow tunnel for nothing (same
    # pattern as the CLI export verb)
    from gmvae_tpu import data as data_lib
    trainer = train_lib.Trainer(
        cfg, data_lib.make_synthetic(image_shape=cfg.image_shape,
                                     n_train=8, n_test=8))
    state = trainer.init_state()
    if args.ckpt:
        from gmvae_tpu.utils import checkpoint as ckpt_lib
        tree = ckpt_lib.restore_ckpt(args.ckpt, trainer.state_to_tree(state))
        state = trainer.tree_to_state(tree)

    rng = np.random.RandomState(0)
    for verb in args.verbs.split(','):
        blob = serving.export_verb(trainer, state, verb)
        fn = jexport.deserialize(blob)
        for b in (int(s) for s in args.batches.split(',')):
            x = rng.rand(b, *cfg.image_shape).astype(np.float32)
            t0 = time.perf_counter()
            _fetch(fn.call(x))            # compile + first run
            compile_s = time.perf_counter() - t0
            lat = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                _fetch(fn.call(x))
                lat.append(time.perf_counter() - t0)
            lat.sort()
            p50 = statistics.median(lat)
            p90 = lat[min(len(lat) - 1, int(0.9 * len(lat)))]
            print(json.dumps({
                'config': args.config, 'verb': verb, 'batch': b,
                'artifact_bytes': len(blob),
                'p50_ms': round(p50 * 1e3, 3),
                'p90_ms': round(p90 * 1e3, 3),
                'img_per_sec': round(b / p50, 1),
                'first_call_s': round(compile_s, 2),
            }), flush=True)
    return 0


def _fetch(out):
    """Force results to host (the only true sync on this platform)."""
    for leaf in (out if isinstance(out, (tuple, list)) else (out,)):
        np.asarray(leaf)


if __name__ == '__main__':
    raise SystemExit(main())
