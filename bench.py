"""Driver benchmark entry: MNIST GMVAE training images/sec/chip.

Prints exactly ONE JSON line (the driver records it in BENCH_r{N}.json).
Thin wrapper over gmvae_tpu.benchmark.run_bench — see that module for
methodology (compile excluded, device->host fetch as the timing fence).

Round 5: the driver metric is the WINDOWED pipeline at the flagship's
real 20k-step horizon — the exact plan pipeline `fit()` pays, timed over
the steps the config actually trains. The r4 metric (reused-plan arm,
2k steps) excluded windowed plan generation entirely and measured a
pipeline real runs never execute; the in-run 20k rate now matches this
metric within 3% (PERF.md "Bench-vs-fit reconciliation"). Each repeat
runs in a FRESH subprocess — the process shape every real invocation has
(long-lived processes measure 1-2.5% low; see fresh_process_bench).
Override with GMVAE_BENCH_PIPELINE=reused / GMVAE_BENCH_STEPS=N to
reproduce the old step-isolation number.
"""

import json
import os
import sys
import time

try:
    from gmvae_tpu.benchmark import run_bench
except ImportError:  # driver runs this file in place, package not installed
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gmvae_tpu.benchmark import run_bench


def _backend_reachable(timeout_s: int = 180) -> bool:
    """Bounded backend probe in a subprocess.

    The axon remote-TPU tunnel has two observed failure modes, and the
    probe must catch both:

    - tunnel DOWN: backend init (``jax.devices()``) hangs forever — an
      in-process probe would hang this entry point too, so probe in a
      killable subprocess;
    - tunnel UP but pool DEGRADED (observed 2026-08-19): ``jax.devices()``
      returns fine while every compile/execute/fetch RPC hangs — a
      device-listing probe passes and the bench then hangs on its first
      timing fence. The probe therefore runs a tiny jitted op end to end
      INCLUDING the device->host fetch (the only real fence on axon).
    """
    import subprocess
    try:
        p = subprocess.run(
            [sys.executable, '-c',
             'import jax, numpy; '
             'v = jax.jit(lambda: (jax.numpy.ones((8, 128)) * 2).sum())(); '
             'assert float(numpy.asarray(v)) == 2048.0'],
            env=dict(os.environ), timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return p.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_backend(window_s: float = 2700.0, retry_every_s: float = 180.0,
                     probe=None, sleep=None, now=None, log=None) -> bool:
    """Retry the backend probe over a bounded window before giving up.

    Round 3's single 180 s probe forfeited the whole round's BENCH
    artifact on one transient tunnel flap (BENCH_r03.json rc=3). This
    re-probes every ``retry_every_s`` for up to ``window_s`` (defaults:
    45 min window, 3 min between probes — env-overridable via
    GMVAE_BENCH_PROBE_WINDOW_S / GMVAE_BENCH_PROBE_EVERY_S), logging
    progress to stderr, and only then reports unreachable. Always probes
    at least once, so window_s=0 degrades to the old single-probe shape.
    """
    probe = probe or _backend_reachable
    sleep = sleep or time.sleep
    now = now or time.monotonic
    log = log or (lambda msg: print(msg, file=sys.stderr, flush=True))
    t0 = now()
    attempt = 0
    while True:
        attempt += 1
        if probe():
            if attempt > 1:
                log(f'bench.py: backend reachable after {attempt} probes '
                    f'({now() - t0:.0f} s)')
            return True
        elapsed = now() - t0
        if elapsed >= window_s:
            log(f'bench.py: backend still unreachable after {attempt} '
                f'probes over {elapsed:.0f} s — giving up')
            return False
        log(f'bench.py: backend unreachable (probe {attempt}, '
            f'{elapsed:.0f}/{window_s:.0f} s) — retrying in '
            f'{retry_every_s:.0f} s')
        sleep(retry_every_s)


def median_capture(repeats: int, bench=None, log=None) -> dict:
    """Run the bench ``repeats`` times, emit the median-value run.

    Single-shot driver captures sit in a measured 4-14% repeat spread
    (PERF.md "Bench-vs-fit reconciliation": reused-arm spread 13.8% over
    5 same-session repeats), so one draw can misstate the binary by most
    of that band. This runs the identical bench back-to-back — the first
    call pays any residual compile, later calls are pure timed windows —
    and reports the run whose value is the MEDIAN (``median_low``: a real
    capture, not a synthetic average), annotated with ``repeats`` and the
    observed ``spread_pct`` so every BENCH artifact carries its own
    repeat distribution (VERDICT r4 weak #3). ``repeats=1`` preserves the
    exact historical one-shot schema.
    """
    import statistics
    bench = bench or run_bench
    log = log or (lambda msg: print(msg, file=sys.stderr, flush=True))
    runs = []
    for i in range(max(1, repeats)):
        r = bench()
        runs.append(r)
        log(f'bench.py: repeat {i + 1}/{repeats}: {r["value"]} {r["unit"]}')
    if len(runs) == 1:
        return runs[0]
    values = sorted(r['value'] for r in runs)
    med = statistics.median_low(values)
    out = dict(next(r for r in runs if r['value'] == med))
    out['repeats'] = len(runs)
    out['spread_pct'] = round(100.0 * (values[-1] - values[0]) / med, 2)
    return out


def driver_bench(env=None, bench=None):
    """The bench callable the driver metric runs: windowed pipeline (the
    real ``fit()`` plan path — PERF.md "Bench-vs-fit reconciliation") at
    the flagship's real 20k-step horizon and its shipped scan-chunk pin
    (run_bench drives cfg.scan_steps when unset — 400 since the r5
    re-pin), env-overridable back to the step-isolation arm
    (GMVAE_BENCH_PIPELINE=reused, GMVAE_BENCH_STEPS=N,
    GMVAE_BENCH_SCAN_STEPS=N reproduces historical scan-100 captures).
    """
    env = os.environ if env is None else env
    bench = bench or run_bench
    steps = int(env.get('GMVAE_BENCH_STEPS', 20_000))
    pipeline = env.get('GMVAE_BENCH_PIPELINE', 'windowed')
    kw = {}
    if 'GMVAE_BENCH_SCAN_STEPS' in env:
        kw['scan_steps'] = int(env['GMVAE_BENCH_SCAN_STEPS'])
    return lambda: bench(steps=steps, pipeline=pipeline, **kw)


_SUBPROC_MARK = 'BENCH_JSON:'
_SUBPROC_CODE = (
    'import json, bench;'
    'from gmvae_tpu.utils.compile_cache import enable_compile_cache;'
    'enable_compile_cache();'
    f'print({_SUBPROC_MARK!r} + json.dumps(bench.driver_bench()()))'
)


def fresh_process_bench(runner=None, fallback=None, log=None, env=None):
    """One driver-bench capture in a FRESH python process.

    Absolute throughput is only authoritative from a fresh process:
    repeats inside one long-lived process measure 1–2.5% low (and the
    bench_ab interleaved instrument measured its windowed arm 10–17% low
    the same way) because per-repeat Trainer/jit executables accumulate —
    PERF.md "Bench-vs-fit reconciliation", instrument caveat. The driver
    metric therefore runs every repeat as its own process (the exact shape
    every real invocation has), parsing one marked JSON line back. A
    subprocess failure (tunnel flap mid-repeat, timeout) falls back to an
    in-process capture for that repeat — a measurement 1–2.5% conservative
    beats a forfeited BENCH artifact.
    """
    import subprocess
    env = os.environ if env is None else env
    log = log or (lambda msg: print(msg, file=sys.stderr, flush=True))
    fallback = fallback or driver_bench(env=env)
    timeout_s = float(env.get('GMVAE_BENCH_REPEAT_TIMEOUT_S', 1800))

    def _run(cmd, **kw):
        return subprocess.run(cmd, **kw)

    runner = runner or _run

    def capture():
        try:
            p = runner([sys.executable, '-c', _SUBPROC_CODE],
                       env=dict(env), timeout=timeout_s,
                       cwd=os.path.dirname(os.path.abspath(__file__)),
                       capture_output=True, text=True)
            for line in (p.stdout or '').splitlines():
                if line.startswith(_SUBPROC_MARK):
                    return json.loads(line[len(_SUBPROC_MARK):])
            log('bench.py: fresh-process repeat produced no result '
                f'(rc={p.returncode}); falling back to in-process: '
                + (p.stderr or '')[-300:])
        except Exception as e:  # TimeoutExpired, OSError
            log(f'bench.py: fresh-process repeat failed ({e!r}); '
                'falling back to in-process')
        return fallback()

    return capture


if __name__ == '__main__':
    window_s = float(os.environ.get('GMVAE_BENCH_PROBE_WINDOW_S', 2700))
    retry_s = float(os.environ.get('GMVAE_BENCH_PROBE_EVERY_S', 180))
    if not wait_for_backend(window_s=window_s, retry_every_s=retry_s):
        print('bench.py: accelerator backend unreachable (remote-TPU '
              'tunnel down or hung) — retried over a bounded window; '
              'rerun when the tunnel recovers', file=sys.stderr)
        sys.exit(3)
    from gmvae_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    repeats = int(os.environ.get('GMVAE_BENCH_REPEATS', 5))
    print(json.dumps(median_capture(repeats, bench=fresh_process_bench())))
