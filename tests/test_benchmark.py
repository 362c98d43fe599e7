"""Benchmark harness tests (SURVEY.md §2.1 'Benchmark harness'): schema,
compile exclusion, the timing fence actually forcing execution, and the
driver entry's bounded probe-retry window (VERDICT r3 #1)."""

import importlib.util
import json
import os

from gmvae_tpu import benchmark, configs


def _load_bench_module():
    path = os.path.join(os.path.dirname(__file__), '..', 'bench.py')
    spec = importlib.util.spec_from_file_location('bench_entry', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_wait_for_backend_retries_through_a_transient_flap():
    """One transient outage at capture time must not forfeit the BENCH
    artifact: the probe retries within the window and succeeds when the
    tunnel recovers (r3's single-probe behavior returned False here)."""
    bench = _load_bench_module()
    results = iter([False, False, True])
    clock = [0.0]

    def fake_sleep(s):
        clock[0] += s

    logs = []
    ok = bench.wait_for_backend(
        window_s=600, retry_every_s=60, probe=lambda: next(results),
        sleep=fake_sleep, now=lambda: clock[0], log=logs.append)
    assert ok
    assert clock[0] == 120  # two sleeps between the three probes
    assert any('retrying' in m for m in logs)
    assert any('reachable after 3 probes' in m for m in logs)


def test_wait_for_backend_gives_up_after_the_window():
    bench = _load_bench_module()
    clock = [0.0]
    probes = [0]

    def probe():
        probes[0] += 1
        return False

    ok = bench.wait_for_backend(
        window_s=300, retry_every_s=100, probe=probe,
        sleep=lambda s: clock.__setitem__(0, clock[0] + s),
        now=lambda: clock[0], log=lambda m: None)
    assert not ok
    # probes at t=0,100,200,300; the t=300 one hits the window bound
    assert probes[0] == 4


def test_wait_for_backend_zero_window_probes_exactly_once():
    """window_s=0 degrades to the old single-probe shape (no sleep)."""
    bench = _load_bench_module()
    probes = [0]

    def probe():
        probes[0] += 1
        return False

    ok = bench.wait_for_backend(
        window_s=0, retry_every_s=60, probe=probe,
        sleep=lambda s: (_ for _ in ()).throw(AssertionError('slept')),
        now=lambda: 0.0, log=lambda m: None)
    assert not ok and probes[0] == 1


def test_backend_probe_round_trips_an_execution():
    """The probe must exercise compile+execute+device->host fetch, not just
    device listing: the axon pool's observed degraded mode (2026-08-19)
    answers ``jax.devices()`` while every execution RPC hangs, so a
    listing-only probe passes and the bench then hangs past the driver's
    timeout. On the test env's live CPU backend the end-to-end probe
    must succeed inside its window."""
    bench = _load_bench_module()
    assert bench._backend_reachable(timeout_s=120)


def test_run_bench_schema_and_sanity():
    cfg = configs.synthetic_tiny(batch_size=32)
    r = benchmark.run_bench(cfg, steps=4, scan_steps=2, warmup_chunks=1)
    assert set(r) == {'metric', 'value', 'unit'}
    assert r['metric'] == 'synthetic_tiny_train_throughput'
    assert r['unit'] == 'images/sec/chip'
    assert r['value'] > 0
    # the 50k north-star ratio is flagship-only (MNIST-specific target);
    # non-flagship configs omit the key rather than emit JSON null
    assert 'vs_baseline' not in r
    json.dumps(r)  # one-line JSON serializable


def test_run_bench_flagship_contract():
    """The driver's bench.py contract: the mnist_k10 config reports the
    pinned metric name and the vs-50k ratio."""
    cfg = configs.mnist_k10(batch_size=32, fused=False,
                            enc_hidden=(32, 32), dec_hidden=(32, 32))
    r = benchmark.run_bench(cfg, steps=4, scan_steps=2, warmup_chunks=1)
    assert r['metric'] == 'mnist_gmvae_train_throughput'
    assert abs(r['vs_baseline'] - r['value'] / 50_000.0) < 1e-3


def test_run_bench_windowed_pipeline_arm():
    """pipeline='windowed' drives fit()'s real iter_chunk_plans pipeline
    (VERDICT r4 weak #3's A/B instrument): same schema, plausible rate,
    detail stamped with the arm; bad arm names rejected."""
    import pytest
    cfg = configs.synthetic_tiny(batch_size=32)
    r = benchmark.run_bench(cfg, steps=4, scan_steps=2, warmup_chunks=1,
                            pipeline='windowed', detail=True)
    assert r['value'] > 0
    assert r['detail']['pipeline'] == 'windowed'
    assert r['detail']['steps'] == 4
    r2 = benchmark.run_bench(cfg, steps=4, scan_steps=2, warmup_chunks=1,
                             detail=True)
    assert r2['detail']['pipeline'] == 'reused'
    with pytest.raises(ValueError, match='reused|windowed'):
        benchmark.run_bench(cfg, steps=4, scan_steps=2, pipeline='nope')


def test_run_bench_windowed_host_stream():
    """The windowed arm composes with host_stream placement (staged
    batches come from the same iterator fit() uses)."""
    cfg = configs.synthetic_tiny(batch_size=32,
                                 data_placement='host_stream')
    r = benchmark.run_bench(cfg, steps=4, scan_steps=2, warmup_chunks=1,
                            pipeline='windowed')
    assert r['value'] > 0


def test_run_bench_defaults_scan_to_config_pin():
    """With scan_steps unset, run_bench drives the CONFIG's measured scan
    pin instead of a harness-forced constant — otherwise the driver metric
    silently measures a binary users never run when a pin moves (the r5
    flagship re-pin to 400 exposed exactly this: plain `python bench.py`
    kept timing scan-100)."""
    cfg = configs.synthetic_tiny(batch_size=32, scan_steps=2)
    r = benchmark.run_bench(cfg, steps=4, warmup_chunks=1, detail=True)
    # 2 chunks x the config's scan pin of 2; the old forced-100 default
    # would have trained 100 steps here (n_chunks=1 x scan 100)
    assert r['detail']['steps'] == 4
    # the pin the driver metric inherits through this default
    assert configs.mnist_k10().scan_steps == 400


def test_median_capture_picks_a_real_run_and_carries_spread():
    """The driver line must be an actual capture (median_low), not an
    average, and must carry repeats + observed spread (VERDICT r4 #3)."""
    bench = _load_bench_module()
    vals = iter([110.0, 90.0, 100.0])

    def fake():
        return {'metric': 'm', 'value': next(vals), 'unit': 'u',
                'vs_baseline': 2.0}

    out = bench.median_capture(3, bench=fake, log=lambda m: None)
    assert out['value'] == 100.0  # the median run, verbatim
    assert out['repeats'] == 3
    assert out['spread_pct'] == 20.0  # (110-90)/100
    assert out['vs_baseline'] == 2.0  # the median run's own fields ride along
    json.dumps(out)


def test_median_capture_single_repeat_keeps_historical_schema():
    bench = _load_bench_module()
    r = {'metric': 'm', 'value': 5.0, 'unit': 'u'}
    out = bench.median_capture(1, bench=lambda: dict(r), log=lambda m: None)
    assert out == r  # no repeats/spread keys on the one-shot shape


def test_driver_bench_contract_defaults_and_overrides():
    """The driver metric (r5 contract) is the windowed pipeline at the
    flagship's real 20k-step horizon; env overrides restore the r4
    step-isolation arm (PERF.md "Bench-vs-fit reconciliation")."""
    bench = _load_bench_module()
    seen = []

    def fake(steps, pipeline):
        seen.append((steps, pipeline))
        return {'metric': 'm', 'value': 1.0, 'unit': 'u'}

    bench.driver_bench(env={}, bench=fake)()
    assert seen[-1] == (20_000, 'windowed')
    bench.driver_bench(env={'GMVAE_BENCH_STEPS': '2000',
                            'GMVAE_BENCH_PIPELINE': 'reused'}, bench=fake)()
    assert seen[-1] == (2_000, 'reused')


def test_fresh_process_bench_parses_marked_line():
    """The driver repeat runs in a fresh subprocess and parses the ONE
    marked JSON line back (absolute rates are only authoritative from
    fresh processes — PERF.md instrument caveat)."""
    bench = _load_bench_module()
    want = {'metric': 'm', 'value': 7.0, 'unit': 'u'}

    class P:
        returncode = 0
        stdout = ('some jax noise\n' + bench._SUBPROC_MARK
                  + json.dumps(want) + '\n')
        stderr = ''

    calls = []

    def runner(cmd, **kw):
        calls.append(cmd)
        assert bench._SUBPROC_MARK in cmd[-1]
        return P()

    out = bench.fresh_process_bench(
        runner=runner, fallback=lambda: {'value': -1},
        log=lambda m: None, env={})()
    assert out == want and len(calls) == 1


def test_fresh_process_bench_falls_back_on_subprocess_failure():
    """A dead/hung subprocess (tunnel flap mid-repeat) must not forfeit
    the BENCH artifact: the repeat falls back to an in-process capture."""
    bench = _load_bench_module()

    class P:
        returncode = 1
        stdout = ''
        stderr = 'boom'

    logs = []
    out = bench.fresh_process_bench(
        runner=lambda cmd, **kw: P(),
        fallback=lambda: {'metric': 'm', 'value': 3.0, 'unit': 'u'},
        log=logs.append, env={})()
    assert out['value'] == 3.0 and any('falling back' in l for l in logs)

    def raising_runner(cmd, **kw):
        raise OSError('no exec')

    out = bench.fresh_process_bench(
        runner=raising_runner,
        fallback=lambda: {'metric': 'm', 'value': 4.0, 'unit': 'u'},
        log=logs.append, env={})()
    assert out['value'] == 4.0


def test_bench_ab_tool_summary(monkeypatch, capsys):
    """bench_ab interleaves the arms, repeats to the requested counts, and
    the summary carries medians + the plan-pipeline delta."""
    import sys as _sys
    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                     'tools'))
    import bench_ab

    calls = []

    def fake_run_bench(cfg, steps, pipeline):
        calls.append(pipeline)
        val = {'reused': 100.0, 'windowed': 90.0}[pipeline]
        return {'metric': 'm', 'value': val, 'unit': 'u'}

    import gmvae_tpu.benchmark as bm
    monkeypatch.setattr(bm, 'run_bench', fake_run_bench)
    bench_ab.main(['--repeats-reused', '3', '--repeats-windowed', '2'])
    assert calls.count('reused') == 3 and calls.count('windowed') == 2
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    s = lines[-1]
    assert s['reused_median'] == 100.0 and s['windowed_median'] == 90.0
    assert s['plan_pipeline_cost_pct'] == 10.0
    assert s['reused_spread_pct'] == 0.0


def test_compile_exclusion_actually_excludes_compile():
    """With warmup (compile outside the timed window) throughput must be
    far higher than with compile included — the assertion that fails if a
    refactor silently starts timing the first (compiling) chunk."""
    cfg = configs.synthetic_tiny(batch_size=32)
    warm = benchmark.run_bench(cfg, steps=8, scan_steps=4, warmup_chunks=1)
    cold = benchmark.run_bench(cfg.replace(name='synthetic_tiny_cold',
                                           enc_hidden=(48, 48)),
                               steps=8, scan_steps=4, warmup_chunks=0)
    # the cold run times its own compile (fresh model shape -> no cache
    # hit); a correct harness shows a large warm/cold gap
    assert warm['value'] > 3 * cold['value'], (warm, cold)


def test_fence_forces_execution():
    """The device->host fence must make the TIMED WINDOW cover real step
    execution: 32x the steps must cost well over 4x the window time (if
    the fence were a no-op, every window would collapse to dispatch time
    and the ratio would be ~1)."""
    cfg = configs.synthetic_tiny(batch_size=64, enc_hidden=(256, 256),
                                 dec_hidden=(256, 256))

    def window(steps):
        r = benchmark.run_bench(cfg, steps=steps, scan_steps=2, detail=True)
        return r['detail']['seconds']

    window(2)  # compile once
    t_small, t_big = window(2), window(64)
    assert t_big > 4 * t_small, (t_small, t_big)
