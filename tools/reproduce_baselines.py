"""Reproduce the BASELINE.md measured table.

Trains every named config at its UNMODIFIED defaults (only steps/eval
cadence pinned), reports trained ELBO/ACC/NMI plus steady-state throughput
(img/s/chip, compile excluded), one JSON line per config:

    python tools/reproduce_baselines.py                 # all rows
    python tools/reproduce_baselines.py svhn_conv       # one row
    python tools/reproduce_baselines.py --require-real  # acceptance mode

Run on the target hardware (the recorded rows: one TPU v5e chip). Real
datasets are used when present under $GMVAE_DATA_DIR (see
data/loaders.py); otherwise the deterministic crc32-seeded stand-ins are
substituted with a warning — BASELINE.md footnotes which rows used which.

Every row is provenance-stamped (``synthetic_standin`` + ``source``, the
loader-kind:path string from data/loaders.py) so the output is
self-describing about what data backed it. ``--require-real`` turns the
run into the acceptance protocol (VERDICT r3 #6): EVERY selected row's
real dataset must resolve from $GMVAE_DATA_DIR *before any training
starts* — a missing one fails fast listing exactly what to provide, so
the day real data arrives the full train -> eval -> report acceptance
sweep is this one command.
"""

import argparse
import json
import os
import sys
import time

# runnable as `python tools/reproduce_baselines.py` from anywhere: script
# mode puts tools/ (not the repo root) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gmvae_tpu import configs
from gmvae_tpu import data as data_lib
from gmvae_tpu import training as train_lib

# (config, train_steps, eval_examples, config_kwargs). celeba_dp16 is its
# single-chip smoke shape — the named config's global batch 1024 targets a
# v5e-16 pod slice (BASELINE.md footnote).
PLAN = [
    ('mnist_k10', 20_000, 10_000, {}),
    ('mnist_vae', 20_000, 10_000, {}),
    ('mnist_deepmix', 20_000, 10_000, {}),
    ('fmnist_deep', 20_000, 10_000, {}),
    ('synthetic_hard', 10_000, 10_000, {}),
    ('svhn_conv', 10_000, 10_000, {}),
    ('cifar_k20', 10_000, 10_000, {}),
    ('celeba_dp16', 2_000, 2_048, {'batch_size': 256, 'scan_steps': 100}),
]


def measure(name: str, steps: int, n_eval: int, kw: dict,
            require_real: bool = False) -> dict:
    cfg = configs.get_config(name, **kw).replace(
        steps=steps, eval_every=10**9, ckpt_every=0)
    if cfg.scan_steps < 50:
        cfg = cfg.replace(scan_steps=50)
    # require_real also disables the fallback HERE (not just preflight) so
    # a dataset vanishing mid-sweep cannot silently demote a row; the flag
    # is a no-op for the synthetic* datasets (load() returns them first)
    ds = data_lib.load(cfg.dataset, image_shape=cfg.image_shape,
                       allow_synthetic_fallback=not require_real)
    t0 = time.perf_counter()
    trainer = train_lib.Trainer(cfg, ds)
    state = trainer.init_state()
    # the SAME windowed plan pipeline fit() uses (single-sourced:
    # Trainer.iter_chunk_plans — bounded memory, uniform window shapes,
    # host-round-trip generation amortized out of the timed path)
    t_steady, imgs = None, 0
    for s, idx in trainer.iter_chunk_plans(0, steps):
        state, m = trainer.run_chunk(state, idx)
        if t_steady is None:
            # first chunk includes compile: fence (device->host scalar — the
            # only true sync on the axon platform, PERF.md), then restart
            # the timing window
            float(np.asarray(m['elbo'][-1]))
            t_steady, imgs = time.perf_counter(), 0
        else:
            imgs += s * cfg.batch_size
    float(np.asarray(m['elbo'][-1]))  # final fence
    if imgs == 0:
        raise SystemExit(
            f'{name}: steps ({steps}) fit in one scan chunk, which this '
            f'harness treats entirely as warmup — raise steps above '
            f'scan_steps or the throughput row would read 0')
    ips = imgs / max(time.perf_counter() - t_steady, 1e-9)
    row = trainer.evaluate(state, max_examples=n_eval)
    # imgs counts the GLOBAL batch, so per-chip divides by the GLOBAL
    # device count (multi-host pod reproductions would otherwise overstate
    # by the process count)
    row.update(config=name, steps=steps, synthetic_standin=ds.synthetic,
               source=ds.source,
               img_per_sec_chip=round(ips / jax.device_count(), 1),
               total_secs=round(time.perf_counter() - t0, 1))
    return row


def preflight_require_real(names) -> None:
    """Fail fast (before ANY training) unless every selected config's REAL
    dataset resolves. Probes the loaders with the synthetic fallback
    disabled and raises SystemExit naming every missing dataset at once —
    an acceptance run must not train for hours and then report stand-ins.
    """
    missing = []
    for name, _, _, kw in PLAN:
        if name not in names:
            continue
        cfg = configs.get_config(name, **kw)
        if cfg.dataset.startswith('synthetic'):
            continue  # synthetic_hard IS the real (frozen) fixture
        try:
            ds = data_lib.load(cfg.dataset, allow_synthetic_fallback=False,
                               image_shape=cfg.image_shape)
            del ds  # probe only; measure() reloads to keep peak RSS one-set
        except FileNotFoundError as e:
            missing.append(f'{name} ({cfg.dataset}): {e}')
    if missing:
        raise SystemExit(
            '--require-real: real datasets missing for '
            f'{len(missing)} row(s); provide them under $GMVAE_DATA_DIR '
            '(formats: data/loaders.py docstrings) and rerun:\n  '
            + '\n  '.join(missing))


def main(argv=None) -> None:
    from gmvae_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument('configs', nargs='*',
                    help='row names to run (default: all)')
    ap.add_argument('--require-real', action='store_true',
                    help='acceptance mode: fail fast unless every selected '
                         'row resolves a REAL dataset (no synthetic '
                         'stand-in may back any reported number)')
    args = ap.parse_args(argv)
    which = set(args.configs or [n for n, *_ in PLAN])
    unknown = which - {n for n, *_ in PLAN}
    if unknown:
        raise SystemExit(f'unknown configs: {sorted(unknown)}')
    if args.require_real:
        preflight_require_real(which)
    for name, steps, n_eval, kw in PLAN:
        if name in which:
            print(json.dumps(measure(name, steps, n_eval, kw,
                                     require_real=args.require_real)),
                  flush=True)


if __name__ == '__main__':
    main()
