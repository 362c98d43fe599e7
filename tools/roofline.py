"""Per-config roofline accounting: FLOPs + HBM bytes per step vs measured
throughput (VERDICT r2 next-round #2).

For every named config this compiles the REAL train chunk (the same
jit(shard_map(scan)) program fit()/bench run) and reads the compiler's own
cost model — ``compiled.cost_analysis()`` 'flops' and 'bytes accessed' —
then divides by scan_steps for per-step numbers. Combined with a measured
img/s/chip (passed in, or measured fresh with --measure) it reports
sustained TFLOP/s, HBM GB/s, and percent-of-peak on both axes, plus which
roofline bound is closer.

TPU v5e peaks (public spec): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.

    python tools/roofline.py                 # cost model only (any backend)
    python tools/roofline.py --measure       # + fresh throughput (on TPU)
    python tools/roofline.py cifar_k20 --measure

Prints one JSON row per config and a markdown table to stderr for PERF.md.
"""

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: script mode
# puts tools/ (not the repo root) on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys

import jax
import numpy as np

from gmvae_tpu import configs
from gmvae_tpu import data as data_lib
from gmvae_tpu import training as train_lib

PEAK_TFLOPS = {'tpu': 197.0}     # v5e bf16; other backends: report raw only
PEAK_HBM_GBS = {'tpu': 819.0}

# single-chip measurement shapes: celeba_dp16's global batch 1024 targets a
# v5e-16 slice; its recorded single-chip smoke uses batch 256 (BASELINE.md)
MEASURE_KW = {'celeba_dp16': {'batch_size': 256, 'scan_steps': 100}}

NAMES = ['mnist_k10', 'mnist_vae', 'mnist_deepmix', 'fmnist_deep',
         'synthetic_hard', 'svhn_conv', 'cifar_k20', 'celeba_dp16']


def analyze(name: str, measure: bool, steps: int = 2000) -> dict:
    kw = dict(MEASURE_KW.get(name, {}))
    cfg = configs.get_config(name, **kw).replace(eval_every=10**9,
                                                 ckpt_every=0)
    if cfg.scan_steps < 50:
        cfg = cfg.replace(scan_steps=50)
    ds = data_lib.load(cfg.dataset, image_shape=cfg.image_shape)
    trainer = train_lib.Trainer(cfg, ds)
    state = trainer.init_state()
    idx = trainer.batch_plan(cfg.scan_steps)

    # cost analysis on a ONE-step chunk: XLA's cost model counts a While
    # (scan) body once regardless of trip count, so the per-step numbers
    # must come from a single-step program (measured: the 100-step chunk
    # reports the same flops as the 1-step one)
    lowered = trainer.train_chunk.lower(state, trainer.x_all, idx[:1],
                                        trainer.base_key)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older API returned one dict per device
        cost = cost[0]
    flops_step = float(cost.get('flops', 0.0))
    bytes_step = float(cost.get('bytes accessed', 0.0))
    s = cfg.scan_steps
    row = {
        'config': name,
        'batch': cfg.batch_size,
        'scan_steps': s,
        'backend': jax.default_backend(),
        'gflops_per_step': round(flops_step / 1e9, 3),
        'hbm_mb_per_step': round(bytes_step / 1e6, 2),
    }

    if measure:
        # steady-state throughput, compile excluded, device->host scalar
        # fence (the only true sync on the axon platform — PERF.md)
        import time
        state, m = trainer.run_chunk(state, idx)       # compile + warm
        float(np.asarray(m['elbo'][-1]))
        n_chunks = max(1, steps // s)
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            state, m = trainer.run_chunk(state, idx)
        float(np.asarray(m['elbo'][-1]))
        dt = time.perf_counter() - t0
        ips = n_chunks * s * cfg.batch_size / dt / jax.device_count()
        row['img_per_sec_chip'] = round(ips, 1)
        # flops_step is the PER-DEVICE compiled module's count; the
        # per-chip FLOP rate is per-device-flops x GLOBAL steps/sec
        # (dividing global rate by device count twice understated MFU
        # n_chips-fold on multi-chip meshes; single-chip unchanged)
        steps_per_sec = ips * jax.device_count() / cfg.batch_size
        tflops = flops_step * steps_per_sec / 1e12
        gbs = bytes_step * steps_per_sec / 1e9
        row['sustained_tflops'] = round(tflops, 3)
        # 'bytes accessed' counts LOGICAL buffer touches before fusion —
        # measured >3x the physical 819 GB/s on this chip, so it is an
        # upper bound on HBM traffic, not a measurement. Reported as such;
        # the MFU column (flops are exact) is the reliable roofline axis.
        row['hbm_gbs_upper_bound'] = round(gbs, 1)
        peak_t = PEAK_TFLOPS.get(jax.default_backend())
        peak_b = PEAK_HBM_GBS.get(jax.default_backend())
        if peak_t:
            row['mfu_pct'] = round(100 * tflops / peak_t, 2)
            row['hbm_pct_upper_bound'] = round(100 * gbs / peak_b, 2)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('names', nargs='*', default=None)
    ap.add_argument('--measure', action='store_true',
                    help='also measure steady-state throughput (run on TPU)')
    ap.add_argument('--steps', type=int, default=2000)
    args = ap.parse_args()
    from gmvae_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    rows = []
    for name in (args.names or NAMES):
        row = analyze(name, args.measure, args.steps)
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.measure and rows and 'mfu_pct' in rows[0]:
        print('\n| Config | img/s/chip | GFLOP/step | TFLOP/s | MFU '
              '| HBM GB/s (upper bound) |', file=sys.stderr)
        print('|---|---|---|---|---|---|', file=sys.stderr)
        for r in rows:
            print(f"| {r['config']} | {r['img_per_sec_chip']:,.0f} | "
                  f"{r['gflops_per_step']} | {r['sustained_tflops']} | "
                  f"{r['mfu_pct']}% | {r['hbm_gbs_upper_bound']} |",
                  file=sys.stderr)


if __name__ == '__main__':
    main()
