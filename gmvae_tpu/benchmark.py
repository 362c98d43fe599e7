"""Throughput benchmark core: MNIST GMVAE training images/sec/chip.

North-star target: >= 50,000 images/sec/chip on TPU v5e
(/root/repo/BASELINE.json:5; BASELINE.md). Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology (SURVEY.md §3.5): compile (first chunk) is excluded; timing
fences with ``block_until_ready``; throughput = trained images / wall time
over several scan-compiled chunks, divided by local device count.
"""

from __future__ import annotations

import json
import sys
import time


def run_bench(cfg=None, steps: int = 2000, scan_steps=None,
              warmup_chunks: int = 1, quiet: bool = True,
              detail: bool = False, pipeline: str = 'reused'):
    """``scan_steps=None`` (default) drives the CONFIG's measured scan-chunk
    pin — the binary users actually run (the r5 flagship re-pin is 400;
    configs.py). The harness previously forced 100 here, which silently
    decoupled the driver metric from the shipped default when the pin
    moved. Pass an int to isolate a specific chunking (tools/autotune_scan,
    historical scan-100 captures).

    ``pipeline`` selects the input-plan arm (VERDICT r4 weak #3):

    - 'reused' (default here; the step-isolation instrument): one chunk's
      batch plan is generated once and re-fed every timed chunk — plan
      generation and windowed slicing are excluded from the measurement.
    - 'windowed' (what bench.py reports — the r5 driver contract): the
      timed loop drives ``Trainer.iter_chunk_plans`` — the EXACT plan
      pipeline ``fit()`` and tools/reproduce_baselines.py pay (async
      jitted super-chunk window generation, per-chunk device-side slices,
      fresh gather indices every step). Measured representative of real
      runs within 0.7% (PERF.md "Bench-vs-fit reconciliation").
      The reused-vs-windowed delta is the measured plan-pipeline cost.
    """
    import jax
    from gmvae_tpu import configs, training as train_lib
    from gmvae_tpu import data as data_lib

    if pipeline not in ('reused', 'windowed'):
        raise ValueError(f"pipeline must be reused|windowed, got {pipeline!r}")

    cfg = cfg or configs.mnist_k10()
    if scan_steps is None:
        scan_steps = cfg.scan_steps
    cfg = cfg.replace(scan_steps=scan_steps, steps=steps,
                      eval_every=10**9, ckpt_every=0)

    # dataset: real MNIST when cached, else the deterministic synthetic
    # stand-in of identical shape — identical compute either way
    ds = data_lib.load(cfg.dataset, image_shape=cfg.image_shape)
    trainer = train_lib.Trainer(cfg, ds)
    state = trainer.init_state()

    import numpy as np

    if trainer.x_all is None:
        # host_stream placement: re-stage the chunk's batches from host
        # every iteration so the measured rate includes the gather +
        # host->device put that real streaming training pays
        idx_host = trainer.batch_plan_host(scan_steps)
        payload = lambda: trainer.stage_batches(idx_host)
    else:
        idx = trainer.batch_plan(scan_steps)  # one chunk's plan, reused
        payload = lambda: idx

    def sync(m):
        # device->host scalar fetch: a REAL fence. (On the axon remote
        # platform jax.block_until_ready returns before execution finishes;
        # the state chain means this scalar transitively forces every
        # preceding chunk.)
        return float(np.asarray(m['elbo'][-1]))

    n_chunks = max(1, steps // scan_steps)
    if pipeline == 'windowed':
        # fit()'s real plan pipeline: warmup chunks come off the SAME
        # iterator so the timed window starts mid-stream (window buffers
        # warm), exactly like a run's steady state
        it = trainer.iter_chunk_plans(
            0, (warmup_chunks + n_chunks) * scan_steps)
        m = None
        for _ in range(warmup_chunks):
            state, m = trainer.run_chunk(state, next(it)[1])
        if m is not None:
            sync(m)
        t0 = time.perf_counter()
        for _, idx in it:
            state, m = trainer.run_chunk(state, idx)
        sync(m)
        dt = time.perf_counter() - t0
    else:
        # warmup / compile (warmup_chunks=0 deliberately times the compile —
        # the compile-exclusion test uses it as the control)
        m = None
        for _ in range(warmup_chunks):
            state, m = trainer.run_chunk(state, payload())
        if m is not None:
            sync(m)

        t0 = time.perf_counter()
        for _ in range(n_chunks):
            state, m = trainer.run_chunk(state, payload())
        sync(m)
        dt = time.perf_counter() - t0

    images = n_chunks * scan_steps * cfg.batch_size
    # batch_size is GLOBAL, so per-chip uses the GLOBAL device count
    # (== local on the single-host driver box; differs on pods)
    n_chips = jax.device_count()
    img_per_sec_chip = images / dt / n_chips
    flagship = cfg.name == 'mnist_k10'
    result = {
        # the driver contract pins the flagship's metric name; other
        # configs report under their own name
        'metric': ('mnist_gmvae_train_throughput' if flagship
                   else f'{cfg.name}_train_throughput'),
        'value': round(img_per_sec_chip, 1),
        'unit': 'images/sec/chip',
    }
    if flagship:
        # the 50k img/s north-star is MNIST-specific (BASELINE.json:5);
        # other configs have no published baseline to ratio against, so
        # the key is omitted rather than emitted as JSON null
        result['vs_baseline'] = round(img_per_sec_chip / 50_000.0, 4)
    # m['elbo'][-1] is the last STEP's ELBO under metrics_mode='stacked'
    # but the last CHUNK's mean under 'mean' (training._scan_with_metrics
    # returns a [1]-shaped chunk mean) — the key says which (ADVICE r4)
    elbo_key = ('last_chunk_elbo_mean' if cfg.metrics_mode == 'mean'
                else 'final_elbo_est')
    extra = {'steps': n_chunks * scan_steps, 'seconds': dt,
             'chips': n_chips, 'batch': cfg.batch_size,
             'backend': jax.default_backend(), 'pipeline': pipeline,
             elbo_key: float(m['elbo'][-1])}
    if not quiet:
        print(json.dumps(extra), file=sys.stderr)
    if detail:
        # timed-window internals for the harness's own tests; NOT part of
        # the driver's one-line schema (bench.py uses the default)
        result['detail'] = extra
    return result


