"""Throughput harness (SURVEY.md §2.1 'Benchmark harness').

Thin wrapper over the repo-root ``bench.py`` (which the driver invokes);
kept here so the survey's planned layout maps 1:1. Usage:

    python benchmarks/throughput.py [--config NAME] [--steps N] [--scan N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmvae_tpu.benchmark import run_bench  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument('--config', default='mnist_k10')
    p.add_argument('--steps', type=int, default=2000)
    p.add_argument('--scan', type=int, default=200)
    p.add_argument('--verbose', action='store_true')
    args = p.parse_args(argv)

    from gmvae_tpu import configs
    cfg = configs.get_config(args.config)
    print(json.dumps(run_bench(cfg, steps=args.steps, scan_steps=args.scan,
                               quiet=not args.verbose)))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
