"""Per-config scan-chunk autotune (PERF.md 'Known headroom', VERDICT r2 #2).

Scan chunking is the load-bearing optimization (PERF.md: 1 step/dispatch is
16x slower), but the best ``scan_steps`` is config-dependent: bigger chunks
amortize dispatch further yet compile longer and delay eval cadence. This
sweeps scan_steps at fixed total steps and reports steady-state throughput
per setting, so a config's default can be pinned to measurement.

    python tools/autotune_scan.py cifar_k20 --grid 50,100,200,400
    python tools/autotune_scan.py mnist_k10
"""

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: script mode
# puts tools/ (not the repo root) on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

from gmvae_tpu import configs
from gmvae_tpu.benchmark import run_bench


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('--grid', default='25,50,100,200,400')
    ap.add_argument('--steps', type=int, default=2000,
                    help='timed steps per setting (excl. warmup chunk)')
    ap.add_argument('--set', action='append', default=[], metavar='K=V')
    args = ap.parse_args()
    from gmvae_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    overrides = configs.parse_overrides(args.set)
    grid = [int(x) for x in args.grid.split(',') if x.strip()]
    if not grid or any(s <= 0 for s in grid):
        raise SystemExit(f'--grid needs positive scan_steps values, '
                         f'got {args.grid!r}')
    best = None
    for s in grid:
        cfg = configs.get_config(args.config, **overrides)
        r = run_bench(cfg, steps=max(args.steps, 2 * s), scan_steps=s,
                      warmup_chunks=1)
        row = {'config': args.config, 'scan_steps': s,
               'img_per_sec_chip': r['value']}
        print(json.dumps(row), flush=True)
        if best is None or r['value'] > best[1]:
            best = (s, r['value'])
    print(json.dumps({'config': args.config, 'best_scan_steps': best[0],
                      'best_img_per_sec_chip': best[1]}), flush=True)


if __name__ == '__main__':
    main()
