"""Bench-vs-fit throughput reconciliation (VERDICT r4 weak #3 / next #3).

The driver bench reuses ONE chunk's batch plan for the whole timed window,
excluding the windowed plan generation + slicing that real ``fit()`` runs
pay via ``Trainer.iter_chunk_plans`` — while in-run steady-state rates for
the same binary were recorded well below the bench (1.05-1.59M vs
1.83-1.88M img/s/chip) without a same-session attribution. This tool runs
the arms back-to-back IN ONE SESSION on the same chip so tunnel-day
variance cannot masquerade as pipeline cost:

  (a) reused-plan bench x N repeats  -> median + spread of the driver metric
  (b) windowed-pipeline bench x M    -> the real fit() plan pipeline
  (c) optional: a full reproduce_baselines-style 20k-step in-run rate
      (``--with-inrun``), the number PERF.md's in-run rows quote

One JSON line per run, then a summary line with medians and the measured
plan-pipeline delta pct. Run on the real TPU chip (no env prefix).

    python tools/bench_ab.py                 # a x5, b x3
    python tools/bench_ab.py --with-inrun    # + the 20k in-run arm
"""

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> None:
    from gmvae_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default='mnist_k10')
    ap.add_argument('--steps', type=int, default=2000)
    ap.add_argument('--repeats-reused', type=int, default=5)
    ap.add_argument('--repeats-windowed', type=int, default=3)
    ap.add_argument('--with-inrun', action='store_true',
                    help='also run the 20k-step reproduce_baselines arm '
                         '(its img_per_sec_chip is the in-run rate PERF.md '
                         'quotes; adds ~the full-horizon run time)')
    args = ap.parse_args(argv)

    from gmvae_tpu import configs
    from gmvae_tpu.benchmark import run_bench

    rates = {'reused': [], 'windowed': []}
    # interleave arms a/b so slow tunnel drift affects both equally
    order = (['reused', 'windowed'] *
             max(args.repeats_reused, args.repeats_windowed))
    counts = {'reused': args.repeats_reused,
              'windowed': args.repeats_windowed}
    for arm in order:
        if len(rates[arm]) >= counts[arm]:
            continue
        r = run_bench(configs.get_config(args.config), steps=args.steps,
                      pipeline=arm)
        r['pipeline'] = arm
        rates[arm].append(r['value'])
        print(json.dumps(r), flush=True)

    inrun = None
    if args.with_inrun:
        from reproduce_baselines import measure, PLAN
        row = {n: (s, e, k) for n, s, e, k in PLAN}[args.config]
        out = measure(args.config, row[0], row[1], row[2])
        out['arm'] = 'inrun_full_horizon'
        inrun = out['img_per_sec_chip']
        print(json.dumps(out), flush=True)

    med = {k: statistics.median(v) for k, v in rates.items() if v}
    summary = {
        'config': args.config, 'steps': args.steps,
        'reused_median': med.get('reused'),
        'reused_spread_pct': (round(100 * (max(rates['reused'])
                                           - min(rates['reused']))
                                    / med['reused'], 2)
                              if rates['reused'] else None),
        'windowed_median': med.get('windowed'),
        'windowed_spread_pct': (round(100 * (max(rates['windowed'])
                                             - min(rates['windowed']))
                                      / med['windowed'], 2)
                                if rates['windowed'] else None),
        'plan_pipeline_cost_pct': (
            round(100 * (med['reused'] - med['windowed']) / med['reused'], 2)
            if 'reused' in med and 'windowed' in med else None),
        'inrun_full_horizon': inrun,
    }
    print(json.dumps(summary), flush=True)


if __name__ == '__main__':
    main()
