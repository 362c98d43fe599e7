"""Benchmark harness sanity (SURVEY.md §2.1 'Benchmark harness'): runs on
any backend, returns the driver's JSON schema, excludes compile."""

import json

from gmvae_tpu import benchmark, configs


def test_run_bench_schema_and_sanity():
    cfg = configs.synthetic_tiny(batch_size=32)
    r = benchmark.run_bench(cfg, steps=4, scan_steps=2, warmup_chunks=1)
    assert set(r) == {'metric', 'value', 'unit', 'vs_baseline'}
    assert r['unit'] == 'images/sec/chip'
    assert r['value'] > 0
    assert abs(r['vs_baseline'] - r['value'] / 50_000.0) < 1e-3
    json.dumps(r)  # one-line JSON serializable
